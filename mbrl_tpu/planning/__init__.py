from .core import Agent, RandomAgent
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
    "Agent",
    "RandomAgent",
    "Optimizer",
    "CEMOptimizer",
    "ICEMOptimizer",
    "MPPIOptimizer",
    "TrajectoryOptimizer",
    "TrajectoryOptimizerAgent",
    "create_trajectory_optim_agent_for_model",
]
