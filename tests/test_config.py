"""Config engine tests: composition, interpolation, overrides, instantiation."""
import pathlib

import numpy as np
import pytest

from mbrl_tpu.config import Config, instantiate, load_config, parse_overrides

_CONF_DIR = pathlib.Path(__file__).parent.parent / "mbrl_tpu" / "examples" / "conf"


def test_load_main_composition_and_interpolation():
    cfg = load_config(_CONF_DIR, "main", overrides=[])
    assert cfg.algorithm.name == "pets"
    assert cfg.dynamics_model.ensemble_size == 7
    assert cfg.overrides.env == "cartpole_continuous"
    # ${overrides.planning_horizon} resolved into the agent node
    assert cfg.algorithm.agent.planning_horizon == 15
    # ${action_optimizer} spliced into agent.optimizer, with its own interpolations
    assert cfg.algorithm.agent.optimizer["_target_"] == "mbrl_tpu.planning.CEMOptimizer"
    assert cfg.algorithm.agent.optimizer.num_iterations == 5
    # mandatory ??? fields raise on direct access, pass through .get
    with pytest.raises(ValueError):
        _ = cfg.algorithm.agent.action_lb
    assert cfg.algorithm.agent.get("action_lb", None) is None


def test_group_swap_and_value_overrides():
    cfg = load_config(
        _CONF_DIR,
        "main",
        overrides=[
            "dynamics_model=basic_ensemble",
            "dynamics_model.ensemble_size=3",
            "seed=7",
        ],
    )
    assert cfg.dynamics_model["_target_"].endswith("BasicEnsemble")
    assert cfg.dynamics_model.ensemble_size == 3
    assert cfg.seed == 7


def test_parse_overrides():
    groups, values = parse_overrides(["algorithm=pets", "a.b.c=1.5", "x.y=[1,2]"])
    assert groups == {"algorithm": "pets"}
    assert values[0] == ("a.b.c", 1.5)
    assert values[1] == ("x.y", [1, 2])
    with pytest.raises(ValueError):
        parse_overrides(["noequals"])


def test_instantiate_nested():
    node = Config(
        {
            "_target_": "mbrl_tpu.models.GaussianMLP",
            "in_size": 3,
            "out_size": 2,
            "num_layers": 1,
            "ensemble_size": 2,
            "hid_size": 8,
        }
    )
    model = instantiate(node)
    assert model.ensemble_size == 2 and model.in_size == 3

    with pytest.raises(ValueError):
        instantiate(Config({"no_target": 1}))


import pytest as _pytest


@_pytest.mark.parametrize(
    "override_file",
    sorted(p.stem for p in (_CONF_DIR / "overrides").glob("*.yaml")),
)
def test_all_override_files_compose(override_file):
    """Every per-env override file must compose with its algorithm group."""
    algo = override_file.split("_")[0]
    overrides = [f"overrides={override_file}"]
    if algo in ("mbpo", "planet"):
        overrides.append(f"algorithm={algo}")
    if algo == "planet":
        overrides.append("dynamics_model=planet")
    cfg = load_config(_CONF_DIR, "main", overrides=overrides)
    assert cfg.overrides.env
    assert cfg.algorithm.name in ("pets", "mbpo", "planet")
    # interpolated hyperparameters resolved to numbers where the group needs them
    if algo == "pets" and "mppi" not in override_file:
        assert isinstance(cfg.algorithm.agent.optimizer.num_iterations, int)
    if algo == "mbpo":
        assert cfg.overrides.sac_batch_size > 0
    if algo == "planet":
        assert cfg.overrides.sequence_length > 0


def test_fast_dynamics_model_variant_builds():
    """gaussian_mlp_ensemble_fast selects the TPU perf knobs (rotate TS1 shuffle,
    bf16 compute) and builds through the canonical factory."""
    import jax.numpy as jnp

    from mbrl_tpu.config.factories import create_one_dim_tr_model

    cfg = load_config(
        _CONF_DIR, "main", overrides=["dynamics_model=gaussian_mlp_ensemble_fast"]
    )
    wrapper = create_one_dim_tr_model(cfg, obs_shape=(10,), act_shape=(4,))
    model = wrapper.model
    assert model.rollout_shuffle == "rotate"
    assert jnp.dtype(model.compute_dtype) == jnp.bfloat16
    assert model.ensemble_size == 7
    state = wrapper.init(__import__("jax").random.PRNGKey(0))
    assert "params" in state and "normalizer" in state


def test_cli_run_creates_run_dir_and_trains(tmp_path):
    """The reference's primary entry surface (examples/main.py): compose config
    with overrides, create env+fns, train PETS tiny, leave a timestamped run
    dir with config.yaml + results.csv."""
    import pathlib

    import numpy as np

    import mbrl_tpu.examples.main as cli
    from mbrl_tpu.config import load_config

    conf = pathlib.Path(cli.__file__).parent / "conf"
    cfg = load_config(conf, "main", overrides=[
        "algorithm=pets", "overrides=pets_cartpole",
        f"root_dir={tmp_path}",
        "overrides.num_steps=30", "overrides.trial_length=15",
        "algorithm.initial_exploration_steps=20",
        "algorithm.freq_train_model=15",
        "overrides.num_epochs_train_model=1",
        "overrides.model_batch_size=8",
        "overrides.cem_population_size=16", "overrides.cem_num_iters=2",
        "overrides.planning_horizon=3", "algorithm.num_particles=4",
        "dynamics_model.ensemble_size=2", "dynamics_model.hid_size=16",
        "dynamics_model.num_layers=2", "seed=0",
    ])
    best = cli.run(cfg)
    assert np.isfinite(best)
    run_dirs = list(tmp_path.glob("pets/*/cartpole_continuous/*/*"))
    assert len(run_dirs) == 1
    assert (run_dirs[0] / "config.yaml").exists()
    assert (run_dirs[0] / "results.csv").exists()
