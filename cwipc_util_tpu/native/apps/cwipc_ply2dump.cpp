/* cwipc_ply2dump: convert a .ply file to .cwipcdump.
 * Native CLI app (reference: apps/cwipc_ply2dump); also serves as the
 * leak-oracle check at exit. */
#include "../cwipc_capi.h"
#include <cstdio>

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "Usage: %s input.ply output.cwipcdump\n", argv[0]);
        return 2;
    }
    char *error = nullptr;
    cwipc_pointcloud *pc = cwipc_read(argv[1], 0, &error, CWIPC_API_VERSION);
    if (!pc) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "read failed");
        return 1;
    }
    if (cwipc_write_debugdump(argv[2], pc, &error) != 0) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "write failed");
        return 1;
    }
    cwipc_pointcloud_free(pc);
    if (cwipc_dangling_allocations(1) != 0) {
        fprintf(stderr, "%s: leaked pointclouds\n", argv[0]);
        return 1;
    }
    return 0;
}
