"""cwipc_util_tpu.net subpackage."""
