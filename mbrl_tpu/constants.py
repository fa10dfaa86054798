"""Shared logging format constants (parity: reference ``mbrl/constants.py:5-10``)."""

RESULTS_LOG_NAME = "results"

EVAL_LOG_FORMAT = [
    ("env_step", "S", "int"),
    ("episode_reward", "R", "float"),
]

STEP_LOG_FORMAT = [
    ("env_step", "S", "int"),
    ("reward", "R", "float"),
]
