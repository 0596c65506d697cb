"""cwipc_util_tpu.scripts subpackage."""
