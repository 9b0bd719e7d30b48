"""tpuslam.kernels"""
