"""Diagnostics smoke tests: construct a fake experiment dir (config + saved model +
buffer), then run DatasetEvaluator / Visualizer / FineTuner on it (mirrors the
reference's tests/mujoco/test_diagnostics.py strategy), plus the PID agent, video
recorder, training browser, and the true-dynamics pool controller."""
import pathlib

import numpy as np
import pytest
import yaml

_CONF_DIR = pathlib.Path(__file__).parent.parent / "mbrl_tpu" / "examples" / "conf"


@pytest.fixture(scope="module")
def experiment_dir(tmp_path_factory):
    """Run a minuscule PETS experiment to produce a real results dir."""
    import jax
    from mbrl_tpu.config import load_config, to_dict
    from mbrl_tpu.util.env import create_handler
    import mbrl_tpu.algorithms.pets as pets

    out = tmp_path_factory.mktemp("exp")
    cfg = load_config(_CONF_DIR, "main", overrides=["overrides=pets_cartpole"])
    cfg.seed = 0
    cfg.overrides["num_steps"] = 40
    cfg.overrides["trial_length"] = 20
    cfg.overrides["freq_train_model"] = 20
    cfg.overrides["num_epochs_train_model"] = 2
    cfg.overrides["patience"] = 2
    cfg.overrides["cem_population_size"] = 40
    cfg.overrides["planning_horizon"] = 5
    cfg.overrides["model_batch_size"] = 32
    cfg.algorithm["initial_exploration_steps"] = 20
    cfg.algorithm["num_particles"] = 3
    cfg.dynamics_model["hid_size"] = 16
    cfg.dynamics_model["num_layers"] = 1
    from mbrl_tpu.config.engine import resolve_interpolations

    resolve_interpolations(cfg)
    with open(out / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)
    handler = create_handler(cfg)
    env, term_fn, reward_fn = handler.make_env(cfg)
    pets.train(env, term_fn, reward_fn, cfg, silent=True, work_dir=str(out))
    return out


def test_dataset_evaluator(experiment_dir, tmp_path):
    from mbrl_tpu.diagnostics import DatasetEvaluator

    ev = DatasetEvaluator(str(experiment_dir), str(experiment_dir), str(tmp_path))
    ev.run()
    plots = list(tmp_path.glob("pred_dim*.png"))
    assert len(plots) == 4  # cartpole has 4 obs dims


def test_visualizer(experiment_dir):
    from mbrl_tpu.diagnostics import Visualizer

    vis = Visualizer(
        lookahead=5, results_dir=str(experiment_dir), num_steps=5, num_model_samples=2
    )
    vis.run()
    assert list((experiment_dir / "diagnostics").glob("pred_step*.png"))


def test_finetuner(experiment_dir):
    from mbrl_tpu.diagnostics import FineTuner

    ft = FineTuner(str(experiment_dir), str(experiment_dir), agent_type="random")
    ft.run(batch_size=16, val_ratio=0.1, num_epochs=2, patience=2, steps_to_collect=20)
    assert (experiment_dir / "finetune" / "model.pkl").exists()
    assert (experiment_dir / "finetune" / "finetune_losses.npz").exists()


def test_pid_agent():
    from mbrl_tpu.planning import PIDAgent

    agent = PIDAgent(
        k_p=np.array([1.0]), k_i=np.array([0.1]), k_d=np.array([0.5]),
        target=np.array([0.0]), state_mapping=np.array([0]),
    )
    # simple first-order system: x' = x + 0.5*a
    x = np.array([1.0, 0.0])
    for _ in range(40):
        a = agent.act(x)
        x[0] = x[0] + 0.5 * float(np.clip(a[0, 0], -1, 1))
    assert abs(x[0]) < 0.1, x[0]
    prev, cum = agent.get_errors()
    assert prev.shape == (1, 1)
    agent.reset()
    assert np.all(agent.get_errors()[1] == 0)
    assert agent.get_parameters().shape == (4,)


def test_video_recorder(tmp_path):
    from mbrl_tpu.util.video import VideoRecorder

    class FakeEnv:
        def render(self):
            return np.zeros((32, 32, 3), dtype=np.uint8)

    rec = VideoRecorder(tmp_path, fps=10)
    rec.init(enabled=True)
    env = FakeEnv()
    for _ in range(5):
        rec.record(env)
    rec.save("test.mp4")
    assert any((tmp_path / "video").iterdir())
    # disabled recorder is a no-op
    rec2 = VideoRecorder(None)
    rec2.init(enabled=True)
    assert not rec2.enabled


def test_training_browser(tmp_path):
    from mbrl_tpu.diagnostics.training_browser import (
        find_results_files,
        group_runs,
        plot_groups,
    )

    # two seeds of the same config -> one aggregated curve
    for seed in range(2):
        run = tmp_path / "pets" / "default" / "cartpole" / "2026.01.01" / f"00000{seed}"
        run.mkdir(parents=True)
        steps = np.arange(0, 1000, 100)
        rewards = steps * 0.1 + seed
        with open(run / "results.csv", "w") as f:
            f.write("env_step,episode_reward\n")
            for s, r in zip(steps, rewards):
                f.write(f"{s},{r}\n")
    files = find_results_files([str(tmp_path)])
    assert len(files) == 2
    groups = group_runs(files)
    out = tmp_path / "curves.png"
    plot_groups(groups, output=str(out))
    assert out.exists()


def test_true_dynamics_controller():
    from mbrl_tpu.diagnostics.control_env import TrueDynamicsController

    ctrl = TrueDynamicsController(
        "cartpole_continuous", horizon=6, population_size=16, num_iterations=2,
        num_workers=2, seed=0,
    )
    try:
        state = ctrl.handler.get_current_state(ctrl.env)
        plan = ctrl.plan(state)
        assert plan.shape == (6, 1)
        assert np.all(plan >= -1) and np.all(plan <= 1)
    finally:
        ctrl.close()


def test_packaging_roundtrip(experiment_dir, tmp_path):
    from mbrl_tpu.util.huggingface import load_model_from_package, package_experiment

    pkg = package_experiment(str(experiment_dir), str(tmp_path / "pkg"))
    assert (pkg / "model.pkl").exists()
    assert (pkg / "README.md").exists()
    assert "mbrl_tpu" in (pkg / "README.md").read_text()
    payload = load_model_from_package(pkg)
    assert "state" in payload and "model" in payload
    # loaded model produces finite predictions
    import jax.numpy as jnp

    m, lv = payload["model"].model.forward(
        payload["state"]["params"], jnp.zeros((2, payload["model"].model.in_size))
    )
    assert np.isfinite(np.asarray(m)).all()


def test_hf_evaluate_agent_and_video(tmp_path):
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_algorithms import MockLineEnv
    from mbrl_tpu.planning import RandomAgent
    from mbrl_tpu.util.huggingface import evaluate_agent
    from mbrl_tpu.util.video import VideoRecorder

    env = MockLineEnv()
    rec = VideoRecorder(tmp_path)
    mean, std = evaluate_agent(env, RandomAgent(env), num_episodes=2, video_recorder=rec)
    assert np.isfinite(mean) and std >= 0


def test_model_card_metadata_and_metrics(experiment_dir, tmp_path):
    """The card must carry Hub model-index metadata + a metrics table when eval
    stats exist, and embed the replay video when recorded (parity with
    reference mbrl/util/huggingface.py:90-111)."""
    from mbrl_tpu.util.huggingface import _render_card

    card = _render_card("pets", "cartpole", 123.4, 5.6, has_video=True)
    assert "model-index:" in card
    assert "type: mean_reward" in card
    assert "123.40 +/- 5.60" in card
    assert "| Algorithm | pets |" in card
    assert 'src="replay.mp4"' in card
    # no-eval cards omit the model-index block but stay valid
    card2 = _render_card("mbpo", "hopper", float("nan"), float("nan"), False)
    assert "model-index:" not in card2
    assert "replay.mp4" not in card2
