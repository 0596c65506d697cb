"""cwipc_util_tpu.filters subpackage."""
