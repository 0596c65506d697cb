"""cwipc_util_tpu.models subpackage."""
