/* Internal: the abstract source implementation class shared between the
 * native translation units (the C ABI exposes it only through the flat
 * cwipc_source_* functions). */

#ifndef CWIPC_UTIL_TPU_SOURCE_IMPL_HPP
#define CWIPC_UTIL_TPU_SOURCE_IMPL_HPP

#include "cwipc_capi.h"

struct cwipc_source {
    virtual ~cwipc_source() = default;
    virtual cwipc_pointcloud *get() = 0;
    virtual bool available(bool wait) = 0;
    virtual bool eof() = 0;
    virtual bool start() = 0;
    virtual void stop() = 0;
    virtual int maxtile() { return 1; }
    virtual bool get_tileinfo(int, struct cwipc_tileinfo *) { return false; }
};

#endif /* CWIPC_UTIL_TPU_SOURCE_IMPL_HPP */
