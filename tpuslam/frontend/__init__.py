"""tpuslam.frontend"""
