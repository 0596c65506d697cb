"""cwipc_util_tpu.registration subpackage."""
