from dregnerf_tpu.geometry import se3, kabsch, rotation, align, cameras  # noqa: F401
