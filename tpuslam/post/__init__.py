"""tpuslam.post"""
