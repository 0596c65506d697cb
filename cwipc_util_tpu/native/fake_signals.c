/* Fake SIGNALS SMD library (test double).
 *
 * Implements the REAL lldash_packager / lldash_play ABI — the exact entry
 * points, argument lists and structures the reference's ctypes bindings
 * declare (reference: python/cwipc/net/sink_lldpkg.py:20-78,
 * source_lldplay.py:23-105) — as a filesystem loopback: the packager
 * writes frames under the base-URL path, the player discovers the stream
 * descriptors and reads frames back in order.  Because the bindings in
 * net/sink_lldpkg.py and net/source_lldplay.py use the same signatures as
 * the reference, the SAME Python code drives either this fake or the real
 * SIGNALS libraries (SIGNALS_SMD_PATH selects which).
 *
 * Built as BOTH liblldash_packager.so and liblldash_play.so so
 * SIGNALS_SMD_PATH can point at the build directory in tests.
 *
 * ABI notes mirrored from the reference binding:
 *  - lldpkg_create takes (mpdname, errorCallback, msgLevel, streamCount,
 *    streamDesc*, baseurl, seg_dur_ms, timeshift_buffer_ms, api_version)
 *    and validates api_version == LLDASH_PACKAGER_API_VERSION;
 *  - lldpkg_destroy takes (handle, bool flush);
 *  - lldplay_grab_frame is TWO-PHASE: a NULL buffer returns the size of
 *    the next pending frame without consuming it, a real buffer copies the
 *    frame, consumes it, and fills FrameInfo.timestamp;
 *  - lldplay_enable_stream(tileIdx, qualityIdx) selects one quality of a
 *    tile GROUP (streams with identical descriptors form a tile, in first
 *    appearance order), disabling the group's other streams;
 *  - errors are reported through the registered callback (message, level)
 *    with level 0 = error.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/stat.h>

#define MAX_STREAMS 64

#define LLDASH_PACKAGER_API_VERSION 0x20250724ULL
#define LLDASH_PLAYOUT_API_VERSION 0x20250722ULL

typedef void (*lldash_error_cb)(const char *msg, int level);

/* Matches the reference's repurposed-SRD stream descriptor
 * (source_lldplay.py:34-50). */
typedef struct {
    uint32_t MP4_4CC;
    uint32_t tileNumber;
    uint32_t x;
    uint32_t y;
    uint32_t z;
    uint32_t totalWidth;
    uint32_t totalHeight;
} streamDesc;

/* Matches the reference player's FrameInfo (source_lldplay.py:23-32). */
typedef struct {
    int64_t timestamp;
    char dsi[256];
    int32_t dsi_size;
} FrameInfo;

typedef struct {
    char dir[1024];
    int nstreams;
    streamDesc descs[MAX_STREAMS];
    long push_seq[MAX_STREAMS]; /* packager: next seq to write */
    long read_seq[MAX_STREAMS]; /* player: next seq to read */
    int enabled[MAX_STREAMS];
    lldash_error_cb error_cb;
} fake_handle;

static const char *url_to_dir(const char *url) {
    if (strncmp(url, "file://", 7) == 0) return url + 7;
    return url;
}

static void report(lldash_error_cb cb, int level, const char *msg) {
    if (cb) cb(msg, level);
}

/* ---- packager (lldpkg_*) ---------------------------------------------- */

void *lldpkg_create(const char *mpd_name, lldash_error_cb error_cb,
                    int msg_level, int nstreams, const streamDesc *descs,
                    const char *baseurl, int seg_dur_ms,
                    int timeshift_buffer_ms, uint64_t api_version) {
    (void)msg_level; (void)seg_dur_ms; (void)timeshift_buffer_ms;
    if (api_version != LLDASH_PACKAGER_API_VERSION) {
        report(error_cb, 0, "lldpkg_create: api version mismatch");
        return NULL;
    }
    if (!baseurl || !*baseurl || !mpd_name || nstreams <= 0 ||
        nstreams > MAX_STREAMS || !descs) {
        report(error_cb, 0, "lldpkg_create: invalid arguments");
        return NULL;
    }
    fake_handle *h = calloc(1, sizeof(fake_handle));
    snprintf(h->dir, sizeof(h->dir), "%s", url_to_dir(baseurl));
    /* strip a trailing slash so frame paths stay canonical */
    size_t len = strlen(h->dir);
    if (len > 1 && h->dir[len - 1] == '/') h->dir[len - 1] = 0;
    h->nstreams = nstreams;
    memcpy(h->descs, descs, (size_t)nstreams * sizeof(streamDesc));
    h->error_cb = error_cb;
    mkdir(h->dir, 0777);
    /* The "MPD": stream count + one descriptor per line. */
    char path[1200];
    snprintf(path, sizeof(path), "%s/streams.txt", h->dir);
    FILE *fp = fopen(path, "w");
    if (!fp) {
        report(error_cb, 0, "lldpkg_create: cannot write MPD");
        free(h);
        return NULL;
    }
    fprintf(fp, "%d\n", nstreams);
    for (int i = 0; i < nstreams; i++) {
        fprintf(fp, "%u %u %u %u %u %u %u\n", descs[i].MP4_4CC,
                descs[i].tileNumber, descs[i].x, descs[i].y, descs[i].z,
                descs[i].totalWidth, descs[i].totalHeight);
    }
    fclose(fp);
    snprintf(path, sizeof(path), "%s/%s.name", h->dir, mpd_name);
    fp = fopen(path, "w");
    if (fp) fclose(fp);
    return h;
}

void lldpkg_destroy(void *handle, int flush) {
    (void)flush;
    free(handle);
}

int lldpkg_push_buffer(void *handle, int stream_index, const char *buffer,
                       size_t size) {
    fake_handle *h = handle;
    if (!h || stream_index < 0 || stream_index >= h->nstreams) {
        if (h) report(h->error_cb, 0, "lldpkg_push_buffer: bad stream index");
        return 0;
    }
    if (!buffer || size == 0) {
        /* a zero-length frame is inexpressible in the two-phase grab
         * protocol (size 0 means "nothing pending") and would stall the
         * stream forever — reject it at the source */
        report(h->error_cb, 0, "lldpkg_push_buffer: empty frame rejected");
        return 0;
    }
    char path[1200], tmp[1220];
    snprintf(path, sizeof(path), "%s/s%d_%08ld.frame", h->dir, stream_index,
             h->push_seq[stream_index]);
    snprintf(tmp, sizeof(tmp), "%s.tmp", path);
    /* write-then-rename: the player's phase-1 size probe must never see a
     * partially-flushed frame file */
    FILE *fp = fopen(tmp, "wb");
    if (!fp) return 0;
    size_t wrote = fwrite(buffer, 1, size, fp);
    if (fclose(fp) != 0 || wrote != size || rename(tmp, path) != 0) {
        remove(tmp);
        report(h->error_cb, 0, "lldpkg_push_buffer: write failed");
        return 0;
    }
    h->push_seq[stream_index]++;
    return 1;
}

int64_t lldpkg_get_media_time(void *handle, int stream_index, int timescale) {
    fake_handle *h = handle;
    if (!h || stream_index < 0 || stream_index >= h->nstreams) return -1;
    /* frames are the fake's media clock: seq count in the given timescale */
    return h->push_seq[stream_index] * (int64_t)timescale;
}

const char *lldpkg_get_version(void) { return "fake-signals-0.2"; }

/* ---- player (lldplay_*) ------------------------------------------------ */

void *lldplay_create(const char *name, lldash_error_cb error_cb,
                     int msg_level, uint64_t api_version) {
    (void)name; (void)msg_level;
    if (api_version != LLDASH_PLAYOUT_API_VERSION) {
        report(error_cb, 0, "lldplay_create: api version mismatch");
        return NULL;
    }
    fake_handle *h = calloc(1, sizeof(fake_handle));
    h->error_cb = error_cb;
    return h;
}

void lldplay_destroy(void *handle) { free(handle); }

int lldplay_play(void *handle, const char *url) {
    fake_handle *h = handle;
    if (!h || !url) return 0;
    snprintf(h->dir, sizeof(h->dir), "%s", url_to_dir(url));
    size_t len = strlen(h->dir);
    if (len > 1 && h->dir[len - 1] == '/') h->dir[len - 1] = 0;
    char path[1200];
    snprintf(path, sizeof(path), "%s/streams.txt", h->dir);
    FILE *fp = fopen(path, "r");
    if (!fp) {
        report(h->error_cb, 0, "lldplay_play: nothing published at URL");
        return 0;
    }
    if (fscanf(fp, "%d", &h->nstreams) != 1) h->nstreams = 0;
    if (h->nstreams <= 0 || h->nstreams > MAX_STREAMS) {
        fclose(fp);
        report(h->error_cb, 0, "lldplay_play: bad MPD");
        return 0;
    }
    for (int i = 0; i < h->nstreams; i++) {
        streamDesc *d = &h->descs[i];
        if (fscanf(fp, "%u %u %u %u %u %u %u", &d->MP4_4CC, &d->tileNumber,
                   &d->x, &d->y, &d->z, &d->totalWidth, &d->totalHeight) != 7) {
            fclose(fp);
            report(h->error_cb, 0, "lldplay_play: truncated MPD");
            return 0;
        }
        h->enabled[i] = 1;
    }
    fclose(fp);
    return 1;
}

int lldplay_get_stream_count(void *handle) {
    fake_handle *h = handle;
    return h ? h->nstreams : 0;
}

int lldplay_get_stream_info(void *handle, int stream_index, streamDesc *out) {
    fake_handle *h = handle;
    if (!h || !out || stream_index < 0 || stream_index >= h->nstreams) return 0;
    *out = h->descs[stream_index];
    return 1;
}

size_t lldplay_grab_frame(void *handle, int stream_index, char *buffer,
                          size_t bufsize, FrameInfo *frame_info) {
    fake_handle *h = handle;
    if (!h || stream_index < 0 || stream_index >= h->nstreams) return 0;
    if (!h->enabled[stream_index]) return 0;
    char path[1200];
    snprintf(path, sizeof(path), "%s/s%d_%08ld.frame", h->dir, stream_index,
             h->read_seq[stream_index]);
    FILE *fp = fopen(path, "rb");
    if (!fp) return 0;
    if (!buffer) {
        /* phase 1: report the pending frame's size, do not consume */
        fseek(fp, 0, SEEK_END);
        long sz = ftell(fp);
        fclose(fp);
        return sz > 0 ? (size_t)sz : 0;
    }
    size_t n = fread(buffer, 1, bufsize, fp);
    fclose(fp);
    if (frame_info) {
        frame_info->timestamp = h->read_seq[stream_index];
        frame_info->dsi_size = 0;
    }
    h->read_seq[stream_index]++;
    return n;
}

/* Streams with identical descriptors form one tile group, in first
 * appearance order (the reference's _init_tile_info grouping). */
static int desc_equal(const streamDesc *a, const streamDesc *b) {
    return memcmp(a, b, sizeof(streamDesc)) == 0;
}

static int tile_group(fake_handle *h, int tile_index, int members[MAX_STREAMS]) {
    int ngroups = 0, nmembers = 0;
    for (int i = 0; i < h->nstreams; i++) {
        int seen = 0;
        for (int j = 0; j < i; j++) {
            if (desc_equal(&h->descs[j], &h->descs[i])) { seen = 1; break; }
        }
        if (seen) continue;
        if (ngroups == tile_index) {
            for (int j = i; j < h->nstreams; j++) {
                if (desc_equal(&h->descs[j], &h->descs[i]))
                    members[nmembers++] = j;
            }
            return nmembers;
        }
        ngroups++;
    }
    return 0;
}

int lldplay_enable_stream(void *handle, int tile_index, int quality_index) {
    fake_handle *h = handle;
    if (!h) return 0;
    int members[MAX_STREAMS];
    int n = tile_group(h, tile_index, members);
    if (quality_index < 0 || quality_index >= n) {
        report(h->error_cb, 0, "lldplay_enable_stream: bad tile/quality");
        return 0;
    }
    for (int i = 0; i < n; i++)
        h->enabled[members[i]] = (i == quality_index);
    /* side-effect file so tests can assert quality switching reached us */
    char path[1200];
    snprintf(path, sizeof(path), "%s/quality_t%d.txt", h->dir, tile_index);
    FILE *fp = fopen(path, "w");
    if (fp) { fprintf(fp, "%d\n", quality_index); fclose(fp); }
    return 1;
}

int lldplay_disable_stream(void *handle, int tile_index) {
    fake_handle *h = handle;
    if (!h) return 0;
    int members[MAX_STREAMS];
    int n = tile_group(h, tile_index, members);
    if (n == 0) return 0;
    for (int i = 0; i < n; i++) h->enabled[members[i]] = 0;
    return 1;
}

const char *lldplay_get_version(void) { return "fake-signals-0.2"; }
