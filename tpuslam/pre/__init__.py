"""tpuslam.pre"""
