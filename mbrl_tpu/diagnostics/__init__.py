from .eval_model_on_dataset import DatasetEvaluator
from .finetune_model_with_controller import FineTuner
from .planet_visualizer import PlanetVisualizer
from .visualize_model_preds import Visualizer

__all__ = ["DatasetEvaluator", "FineTuner", "PlanetVisualizer", "Visualizer"]
