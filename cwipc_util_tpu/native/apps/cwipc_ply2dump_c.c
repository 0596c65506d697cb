/* cwipc_ply2dump_c: pure-C consumer proving the C ABI needs no C++.
 * (reference: apps/cwipc_ply2dump_c). */
#include "../cwipc_capi.h"
#include <stdio.h>

int main(int argc, char **argv) {
    char *error = NULL;
    cwipc_pointcloud *pc;
    if (argc != 3) {
        fprintf(stderr, "Usage: %s input.ply output.cwipcdump\n", argv[0]);
        return 2;
    }
    pc = cwipc_read(argv[1], 0, &error, CWIPC_API_VERSION);
    if (!pc) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "read failed");
        return 1;
    }
    if (cwipc_write_debugdump(argv[2], pc, &error) != 0) {
        fprintf(stderr, "%s: %s\n", argv[0], error ? error : "write failed");
        return 1;
    }
    cwipc_pointcloud_free(pc);
    return 0;
}
