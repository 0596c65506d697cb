/* cwipc_pcl2dump: read a .ply with an app-local reader, convert through
 * cwipc_from_points, save as .cwipcdump.
 *
 * Reference analog: apps/cwipc_pcl2dump/cwipc_pcl2dump.cpp — there the
 * point is reading the pointcloud with an EXTERNAL library (PCL) and
 * constructing the cwipc object from foreign data via the public ABI.
 * This build has no PCL; the app carries its own small PLY parser
 * (ascii + binary_little_endian) for the same exercise.  "-" as the
 * output skips the save and round-trips through copy_uncompressed
 * (the reference's performance-test mode).
 */
#include "../cwipc_capi.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

struct PlyProp {
    std::string name;
    int size; /* bytes, 0 for ascii */
    bool is_float;
};

static int find_prop(const std::vector<PlyProp> &props, const char *name) {
    for (size_t i = 0; i < props.size(); i++)
        if (props[i].name == name) return (int)i;
    return -1;
}

static bool read_ply(const char *path, std::vector<cwipc_point> &out) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return false;
    char line[512];
    bool binary = false;
    long nvertex = 0;
    std::vector<PlyProp> props;
    bool in_vertex = false;
    if (!fgets(line, sizeof(line), fp) || strncmp(line, "ply", 3) != 0) {
        fclose(fp);
        return false;
    }
    while (fgets(line, sizeof(line), fp)) {
        if (strncmp(line, "end_header", 10) == 0) break;
        char a[64], b[64], c[64];
        if (sscanf(line, "format %63s", a) == 1) {
            binary = strncmp(a, "binary_little_endian", 20) == 0;
        } else if (sscanf(line, "element %63s %ld", a, &nvertex) == 2 &&
                   strcmp(a, "vertex") == 0) {
            in_vertex = true;
        } else if (sscanf(line, "element %63s", a) == 1 && strcmp(a, "vertex") != 0) {
            in_vertex = false;
        } else if (in_vertex && sscanf(line, "property %63s %63s", b, c) == 2) {
            PlyProp p;
            p.name = c;
            p.is_float = strncmp(b, "float", 5) == 0 || strncmp(b, "double", 6) == 0;
            p.size = strncmp(b, "double", 6) == 0 ? 8
                     : (strncmp(b, "float", 5) == 0 || strncmp(b, "int", 3) == 0 ||
                        strncmp(b, "uint", 4) == 0) ? 4
                     : (strncmp(b, "short", 5) == 0 || strncmp(b, "ushort", 6) == 0) ? 2
                     : 1;
            props.push_back(p);
        }
    }
    int ix = find_prop(props, "x"), iy = find_prop(props, "y"), iz = find_prop(props, "z");
    int ir = find_prop(props, "red"), ig = find_prop(props, "green"), ib = find_prop(props, "blue");
    int it = find_prop(props, "mask");
    if (it < 0) it = find_prop(props, "tile");
    if (ix < 0 || iy < 0 || iz < 0) {
        fclose(fp);
        return false;
    }
    out.reserve((size_t)nvertex);
    std::vector<double> vals(props.size());
    for (long v = 0; v < nvertex; v++) {
        if (binary) {
            for (size_t p = 0; p < props.size(); p++) {
                unsigned char buf[8];
                if (fread(buf, 1, props[p].size, fp) != (size_t)props[p].size) {
                    fclose(fp);
                    return false;
                }
                if (props[p].is_float && props[p].size == 4) {
                    float f;
                    memcpy(&f, buf, 4);
                    vals[p] = f;
                } else if (props[p].is_float) {
                    double d;
                    memcpy(&d, buf, 8);
                    vals[p] = d;
                } else if (props[p].size == 4) {
                    int32_t q;
                    memcpy(&q, buf, 4);
                    vals[p] = q;
                } else if (props[p].size == 2) {
                    uint16_t q;
                    memcpy(&q, buf, 2);
                    vals[p] = q;
                } else {
                    vals[p] = buf[0];
                }
            }
        } else {
            for (size_t p = 0; p < props.size(); p++) {
                if (fscanf(fp, "%lf", &vals[p]) != 1) {
                    fclose(fp);
                    return false;
                }
            }
        }
        cwipc_point pt;
        pt.x = (float)vals[ix];
        pt.y = (float)vals[iy];
        pt.z = (float)vals[iz];
        pt.r = ir >= 0 ? (uint8_t)vals[ir] : 0;
        pt.g = ig >= 0 ? (uint8_t)vals[ig] : 0;
        pt.b = ib >= 0 ? (uint8_t)vals[ib] : 0;
        pt.tile = it >= 0 ? (uint8_t)vals[it] : 0;
        out.push_back(pt);
    }
    fclose(fp);
    return true;
}

int main(int argc, char **argv) {
    char *message = nullptr;
    if (argc != 3) {
        fprintf(stderr, "Usage: %s pointcloudfile.ply pointcloudfile.cwipcdump\n", argv[0]);
        return 2;
    }
    std::vector<cwipc_point> points;
    if (!read_ply(argv[1], points)) {
        fprintf(stderr, "%s: Error reading pointcloud from %s\n", argv[0], argv[1]);
        return 1;
    }
    fprintf(stderr, "Read pointcloud successfully, %zu points.\n", points.size());

    cwipc_pointcloud *pc = cwipc_from_points(
        points.data(), points.size() * sizeof(cwipc_point), (int)points.size(),
        0, &message, CWIPC_API_VERSION);
    if (!pc) {
        fprintf(stderr, "%s: Cannot convert pointcloud to cwipc: %s\n", argv[0],
                message ? message : "?");
        return 1;
    }
    if (strcmp(argv[2], "-") == 0) {
        size_t nbytes = cwipc_pointcloud_get_uncompressed_size(pc);
        cwipc_point *copy = (cwipc_point *)malloc(nbytes);
        if (!copy) {
            fprintf(stderr, "%s: out of memory\n", argv[0]);
            return 1;
        }
        cwipc_pointcloud_copy_uncompressed(pc, copy, nbytes);
        free(copy);
        fprintf(stderr, "%s: Skipping save\n", argv[0]);
    } else {
        if (cwipc_write_debugdump(argv[2], pc, &message) < 0) {
            fprintf(stderr, "%s: Cannot save pointcloud to cwipcdump: %s\n",
                    argv[0], message ? message : "?");
            return 1;
        }
    }
    cwipc_pointcloud_free(pc);
    if (cwipc_dangling_allocations(1)) return 1;
    return 0;
}
