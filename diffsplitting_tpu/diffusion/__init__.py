from .schedules import make_beta_schedule, DDPMSchedule, build_ddpm_schedule
from .ddpm import DDPMProcess
from .sr3 import SR3Process
from .indi import InDIProcess
from .joint_indi import JointInDIProcess

__all__ = [
    "make_beta_schedule",
    "DDPMSchedule",
    "build_ddpm_schedule",
    "DDPMProcess",
    "SR3Process",
    "InDIProcess",
    "JointInDIProcess",
]
