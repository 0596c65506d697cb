/* cwipc_bench: native CPU baseline of the headline chain.
 *
 * Times downsample + statistical outlier removal + tilefilter on a
 * 1M-point synthetic cloud — the CPU reference number recorded in
 * BASELINE.md (the original PCL library is not installable here; this
 * hash-grid implementation plays the same role). */
#include "../cwipc_capi.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>

int main(int argc, char **argv) {
    int npoints = argc > 1 ? atoi(argv[1]) : 1000000;
    int iters = argc > 2 ? atoi(argv[2]) : 3;
    char *error = nullptr;
    cwipc_source *src = cwipc_synthetic(0, npoints, &error, CWIPC_API_VERSION);
    cwipc_source_start(src);
    cwipc_pointcloud *pc = cwipc_source_get(src);
    int n = cwipc_pointcloud_count(pc);
    float cellsize = 2.0f * cwipc_pointcloud_cellsize(pc);
    double best = 1e18;
    for (int i = 0; i < iters; i++) {
        auto t0 = std::chrono::steady_clock::now();
        cwipc_pointcloud *down = cwipc_downsample(pc, cellsize);
        auto t1 = std::chrono::steady_clock::now();
        cwipc_pointcloud *clean = cwipc_remove_outliers(down, 30, 1.0f, 0);
        auto t2 = std::chrono::steady_clock::now();
        cwipc_pointcloud *part = cwipc_tilefilter(clean, 1);
        auto t3 = std::chrono::steady_clock::now();
        auto dt = std::chrono::duration<double>(t3 - t0).count();
        if (dt < best) best = dt;
        printf("iter %d: %.1f ms (down %.1f, outliers %.1f, tilefilter %.1f)"
               " (%d -> %d -> %d -> %d points)\n", i, dt * 1e3,
               std::chrono::duration<double>(t1 - t0).count() * 1e3,
               std::chrono::duration<double>(t2 - t1).count() * 1e3,
               std::chrono::duration<double>(t3 - t2).count() * 1e3,
               n, cwipc_pointcloud_count(down), cwipc_pointcloud_count(clean),
               cwipc_pointcloud_count(part));
        cwipc_pointcloud_free(down);
        cwipc_pointcloud_free(clean);
        cwipc_pointcloud_free(part);
    }
    printf("native CPU chain: %.1f ms best = %.0f points/sec\n", best * 1e3, n / best);
    cwipc_pointcloud_free(pc);
    cwipc_source_stop(src);
    cwipc_source_free(src);
    return 0;
}
