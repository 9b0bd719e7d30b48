"""tpuslam.utils"""
