"""cwipc_util_tpu.codec subpackage."""
