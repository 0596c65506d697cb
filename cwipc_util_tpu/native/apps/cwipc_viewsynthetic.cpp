/* cwipc_viewsynthetic: synthetic source -> viewer window loop.
 * Native CLI app exercising the sink ABI (reference:
 * apps/cwipc_viewsynthetic/cwipc_viewsynthetic.cpp).  The window here is the
 * headless software viewer, so the app runs (and tests the full
 * feed/caption/interact protocol) without a display; pass a third argument
 * to bound the number of frames (0 = the reference's interact-until-q loop,
 * with a 30 ms key poll per frame). */
#include "../cwipc_capi.h"

#include <cstdio>
#include <cstdlib>

int main(int argc, char **argv) {
    int fps = 0, npoints = 0, maxframes = 0;
    if (argc >= 2) fps = atoi(argv[1]);
    if (argc >= 3) npoints = atoi(argv[2]);
    if (argc >= 4) maxframes = atoi(argv[3]);
    if (argc >= 5 || fps < 0 || npoints < 0 || maxframes < 0) {
        fprintf(stderr, "Usage: %s [fps [npoints [maxframes]]]\n", argv[0]);
        fprintf(stderr, "Create synthetic pointclouds and show them in a window\n");
        return 2;
    }

    char *error = nullptr;
    cwipc_activesource *generator =
        cwipc_synthetic(fps, npoints, &error, CWIPC_API_VERSION);
    if (!generator) {
        fprintf(stderr, "Error: %s\n", error ? error : "cannot create source");
        return 1;
    }
    cwipc_sink *window = cwipc_window("cwipc_viewsynthetic", &error, CWIPC_API_VERSION);
    if (!window) {
        fprintf(stderr, "Error: %s\n", error ? error : "cannot create window");
        return 1;
    }
    cwipc_activesource_start(generator);

    int frame = 0;
    for (;;) {
        cwipc_pointcloud *pc = cwipc_source_get(generator);
        if (!pc) {
            fprintf(stderr, "Error: generator get() returned NULL\n");
            return 1;
        }
        if (!cwipc_sink_feed(window, pc, 1)) {
            fprintf(stderr, "Error: window feed() returned false\n");
            return 1;
        }
        cwipc_pointcloud_free(pc);
        frame++;
        if (maxframes > 0 && frame >= maxframes) break;
        char response = cwipc_sink_interact(window, "Type q to quit", "q", 30);
        if (response == 'q') break;
    }

    cwipc_activesource_stop(generator);
    cwipc_sink_free(window);
    cwipc_source_free(generator);
    printf("cwipc_viewsynthetic: displayed %d frames\n", frame);
    if (cwipc_dangling_allocations(1)) return 1;
    return 0;
}
