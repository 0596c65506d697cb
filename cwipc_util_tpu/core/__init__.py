"""cwipc_util_tpu.core subpackage."""
