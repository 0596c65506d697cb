"""Version of the cwipc_util_tpu framework."""

__version__ = "0.1.0"
