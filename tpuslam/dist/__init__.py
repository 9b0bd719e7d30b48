"""tpuslam.dist"""
