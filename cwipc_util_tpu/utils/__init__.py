"""cwipc_util_tpu.utils subpackage."""
