from libhpc_tpu.bench import matrices, harness  # noqa: F401
