from .closed_loop import ClosedLoopDriver
from .core import Agent, RandomAgent, load_agent
from .linear_feedback import PIDAgent
from .sac import SAC, SACAgent
from .trajectory_opt import (
    CEMOptimizer,
    ICEMOptimizer,
    MPPIOptimizer,
    Optimizer,
    TrajectoryOptimizer,
    TrajectoryOptimizerAgent,
    create_trajectory_optim_agent_for_model,
)

__all__ = [
    "ClosedLoopDriver",
    "Agent",
    "RandomAgent",
    "load_agent",
    "PIDAgent",
    "SAC",
    "SACAgent",
    "Optimizer",
    "CEMOptimizer",
    "ICEMOptimizer",
    "MPPIOptimizer",
    "TrajectoryOptimizer",
    "TrajectoryOptimizerAgent",
    "create_trajectory_optim_agent_for_model",
]
