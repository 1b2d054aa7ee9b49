from slam_plus_plus_tpu.geometry import minimal, triangulate, distortion

__all__ = ["minimal", "triangulate", "distortion"]
