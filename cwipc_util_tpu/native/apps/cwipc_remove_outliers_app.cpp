/* cwipc_remove_outliers (reference: apps/cwipc_remove_outliers). */
#include "../cwipc_capi.h"
#include <cstdio>
#include <cstdlib>

int main(int argc, char **argv) {
    if (argc != 5) {
        fprintf(stderr, "Usage: %s kNeighbors stddev input.ply output.ply\n", argv[0]);
        return 2;
    }
    char *error = nullptr;
    cwipc_pointcloud *pc = cwipc_read(argv[3], 0, &error, CWIPC_API_VERSION);
    if (!pc) { fprintf(stderr, "%s: %s\n", argv[0], error ? error : "read failed"); return 1; }
    cwipc_pointcloud *out = cwipc_remove_outliers(pc, atoi(argv[1]), (float)atof(argv[2]), 1);
    printf("%d -> %d points\n", cwipc_pointcloud_count(pc), cwipc_pointcloud_count(out));
    if (cwipc_write(argv[4], out, &error) != 0) { fprintf(stderr, "write failed\n"); return 1; }
    cwipc_pointcloud_free(pc);
    cwipc_pointcloud_free(out);
    return 0;
}
