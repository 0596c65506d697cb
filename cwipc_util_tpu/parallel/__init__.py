"""cwipc_util_tpu.parallel subpackage."""
