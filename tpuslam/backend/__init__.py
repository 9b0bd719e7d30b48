"""tpuslam.backend"""
