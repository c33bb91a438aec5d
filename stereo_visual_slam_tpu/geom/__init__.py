from stereo_visual_slam_tpu.geom import se3  # noqa: F401
