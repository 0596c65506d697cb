/* cwipc_dump2ply: convert a .cwipcdump file to .ply.
 * Native CLI app (reference: apps/cwipc_dump2ply). */
#include "../cwipc_capi.h"
#include <cstdio>

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "Usage: %s input.cwipcdump output.ply\n", argv[0]);
        return 2;
    }
    char *error = nullptr;
    cwipc_pointcloud *pc = cwipc_read_debugdump(argv[1], &error, CWIPC_API_VERSION);
    if (!pc) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "read failed");
        return 1;
    }
    if (cwipc_write(argv[2], pc, &error) != 0) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "write failed");
        return 1;
    }
    cwipc_pointcloud_free(pc);
    return 0;
}
