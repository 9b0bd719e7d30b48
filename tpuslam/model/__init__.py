"""tpuslam.model"""
