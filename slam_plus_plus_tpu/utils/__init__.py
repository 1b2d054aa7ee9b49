from slam_plus_plus_tpu.utils import matrix_io, flops, timer

__all__ = ["matrix_io", "flops", "timer"]
