"""Robot deployment stack for the Booster T1.

Python runtime around the Booster Robotics DDS SDK (same role as the
reference's deploy/ tree), re-designed around a RobotInterface abstraction
so the full control stack — policy wrappers, the two-thread controller, the
standup state machine — runs identically against the real SDK, Webots, or
the in-process MockSDK used by the test-suite.
"""
