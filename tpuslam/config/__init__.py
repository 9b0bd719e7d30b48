"""tpuslam.config"""
