"""Module-path alias: the reference's binding module is cwipc.util
(python/cwipc/util.py); user code does `from cwipc.util import ...`.
Everything it would import from there is re-exported here."""

from . import *  # noqa: F401,F403
from .abstract import (  # noqa: F401
    cwipc_activesource_abstract,
    cwipc_activesource_wrapper,
    cwipc_pointcloud_abstract,
    cwipc_sink_abstract,
    cwipc_sink_wrapper,
    cwipc_source_abstract,
    cwipc_source_wrapper,
)
from .core.buffers import POINT_DTYPE, POINT_SIZE, PointBuffer  # noqa: F401
from .core.errors import CwipcError  # noqa: F401
from .core.pointcloud import (  # noqa: F401
    CWIPC_API_VERSION,
    cwipc_dangling_allocations,
    cwipc_point,
    cwipc_point_array,
    cwipc_point_numpy_dtype,
    cwipc_pointcloud_wrapper,
    cwipc_skeleton_collection,
    cwipc_skeleton_joint,
    parse_skeleton_collection,
)
