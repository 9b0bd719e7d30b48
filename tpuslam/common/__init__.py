"""tpuslam.common"""
