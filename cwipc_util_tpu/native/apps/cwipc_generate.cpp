/* cwipc_generate: synthetic source -> N ply files.
 * Native CLI app (reference: apps/cwipc_generate). */
#include "../cwipc_capi.h"
#include <cstdio>
#include <cstdlib>
#include <string>

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "Usage: %s count outputdir\n", argv[0]);
        return 2;
    }
    int count = atoi(argv[1]);
    std::string dir = argv[2];
    char *error = nullptr;
    cwipc_source *src = cwipc_synthetic(0, 0, &error, CWIPC_API_VERSION);
    if (!src) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "cannot create source");
        return 1;
    }
    cwipc_source_start(src);
    for (int i = 0; i < count; i++) {
        cwipc_pointcloud *pc = cwipc_source_get(src);
        if (!pc) break;
        std::string fn = dir + "/pointcloud-" + std::to_string(cwipc_pointcloud_timestamp(pc)) + ".ply";
        if (cwipc_write(fn.c_str(), pc, &error) != 0) {
            fprintf(stderr, "%s: %s: %s\n", argv[0], fn.c_str(), error ? error : "write failed");
            return 1;
        }
        printf("%s\n", fn.c_str());
        cwipc_pointcloud_free(pc);
    }
    cwipc_source_stop(src);
    cwipc_source_free(src);
    return 0;
}
