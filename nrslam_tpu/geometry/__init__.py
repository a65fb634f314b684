from nrslam_tpu.geometry import se3, cameras, triangulation
