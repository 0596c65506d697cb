"""cwipc_util_tpu.benchmarks subpackage."""
