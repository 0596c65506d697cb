/* Fake SIGNALS SMD library (test double).
 *
 * Implements the lldash_packager / lldash_play entry points our DASH
 * bindings expect (net/sink_lldpkg.py, net/source_lldplay.py; binding
 * surface modeled on the reference's python/cwipc/net/sink_lldpkg.py and
 * source_lldplay.py) as a filesystem loopback: the packager writes frames
 * under the URL path, the player discovers the stream count and reads them
 * back in order.  Built as BOTH liblldash_packager.so and liblldash_play.so
 * so SIGNALS_SMD_PATH can point at the build directory in tests.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/stat.h>

#define MAX_STREAMS 64

typedef struct {
    char dir[1024];
    int nstreams;
    long push_seq[MAX_STREAMS]; /* packager: next seq to write */
    long read_seq[MAX_STREAMS]; /* player: next seq to read */
    int enabled[MAX_STREAMS];
    int quality[MAX_STREAMS];
} fake_handle;

static const char *url_to_dir(const char *url) {
    if (strncmp(url, "file://", 7) == 0) return url + 7;
    return url;
}

/* ---- packager (lldpkg_*) ---------------------------------------------- */

void *lldpkg_create(const char *name, int nstreams, void *callback,
                    const char *url, int seg_dur_ms, int timeshift_buffer_ms,
                    int flags) {
    (void)name; (void)callback; (void)seg_dur_ms; (void)timeshift_buffer_ms;
    (void)flags;
    if (!url || !*url || nstreams <= 0 || nstreams > MAX_STREAMS) return NULL;
    fake_handle *h = calloc(1, sizeof(fake_handle));
    snprintf(h->dir, sizeof(h->dir), "%s", url_to_dir(url));
    h->nstreams = nstreams;
    mkdir(h->dir, 0777);
    char path[1200];
    snprintf(path, sizeof(path), "%s/streams.txt", h->dir);
    FILE *fp = fopen(path, "w");
    if (!fp) { free(h); return NULL; }
    fprintf(fp, "%d\n", nstreams);
    fclose(fp);
    return h;
}

void lldpkg_destroy(void *handle) { free(handle); }

int lldpkg_push_buffer(void *handle, int stream_index, const char *buffer,
                       size_t size) {
    fake_handle *h = handle;
    if (!h || stream_index < 0 || stream_index >= h->nstreams) return 0;
    char path[1200];
    snprintf(path, sizeof(path), "%s/s%d_%08ld.frame", h->dir, stream_index,
             h->push_seq[stream_index]);
    FILE *fp = fopen(path, "wb");
    if (!fp) return 0;
    fwrite(buffer, 1, size, fp);
    fclose(fp);
    h->push_seq[stream_index]++;
    return 1;
}

/* ---- player (lldplay_*) ------------------------------------------------ */

void *lldplay_create(const char *name, void *callback, const char *opts,
                     int flags) {
    (void)name; (void)callback; (void)opts; (void)flags;
    return calloc(1, sizeof(fake_handle));
}

void lldplay_destroy(void *handle) { free(handle); }

int lldplay_play(void *handle, const char *url) {
    fake_handle *h = handle;
    if (!h || !url) return 0;
    snprintf(h->dir, sizeof(h->dir), "%s", url_to_dir(url));
    char path[1200];
    snprintf(path, sizeof(path), "%s/streams.txt", h->dir);
    FILE *fp = fopen(path, "r");
    if (!fp) return 0; /* nothing published at this URL */
    if (fscanf(fp, "%d", &h->nstreams) != 1) h->nstreams = 0;
    fclose(fp);
    if (h->nstreams <= 0 || h->nstreams > MAX_STREAMS) return 0;
    for (int i = 0; i < h->nstreams; i++) h->enabled[i] = 1;
    return 1;
}

int lldplay_get_stream_count(void *handle) {
    fake_handle *h = handle;
    return h ? h->nstreams : 0;
}

size_t lldplay_grab_frame(void *handle, int stream_index, char *buffer,
                          size_t bufsize, void *timestamp) {
    (void)timestamp;
    fake_handle *h = handle;
    if (!h || stream_index < 0 || stream_index >= h->nstreams) return 0;
    if (!h->enabled[stream_index]) return 0;
    char path[1200];
    snprintf(path, sizeof(path), "%s/s%d_%08ld.frame", h->dir, stream_index,
             h->read_seq[stream_index]);
    FILE *fp = fopen(path, "rb");
    if (!fp) return 0;
    size_t n = fread(buffer, 1, bufsize, fp);
    fclose(fp);
    h->read_seq[stream_index]++;
    return n;
}

int lldplay_enable_stream(void *handle, int tile_index, int quality_index) {
    fake_handle *h = handle;
    if (!h || tile_index < 0 || tile_index >= h->nstreams) return 0;
    h->enabled[tile_index] = 1;
    h->quality[tile_index] = quality_index;
    /* side-effect file so tests can assert quality switching reached us */
    char path[1200];
    snprintf(path, sizeof(path), "%s/quality_t%d.txt", h->dir, tile_index);
    FILE *fp = fopen(path, "w");
    if (fp) { fprintf(fp, "%d\n", quality_index); fclose(fp); }
    return 1;
}

int lldplay_disable_stream(void *handle, int tile_index) {
    fake_handle *h = handle;
    if (!h || tile_index < 0 || tile_index >= h->nstreams) return 0;
    h->enabled[tile_index] = 0;
    return 1;
}
