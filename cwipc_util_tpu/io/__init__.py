"""cwipc_util_tpu.io subpackage."""
