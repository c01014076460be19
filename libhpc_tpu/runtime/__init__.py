from libhpc_tpu.runtime import native  # noqa: F401
