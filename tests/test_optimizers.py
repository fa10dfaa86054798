"""Trajectory optimizer tests. The Rosenbrock CEM parity target comes from the
reference's notebooks/cem_rosenbrock_ex.ipynb (BASELINE.md config #2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbrl_tpu.planning import (
    CEMOptimizer,
    ICEMOptimizer,
    MPPIOptimizer,
    TrajectoryOptimizer,
    TrajectoryOptimizerAgent,
)


def neg_rosenbrock(population, *args):
    """Population shape (P, 1, 2) -> maximize at (1, 1)."""
    x = population[:, 0, 0]
    y = population[:, 0, 1]
    return -(jnp.square(1 - x) + 100.0 * jnp.square(y - jnp.square(x)))


def quadratic_obj(population, center, _key=None):
    # (P, H, A): maximize -(x - center)^2 summed
    return -jnp.square(population - center).sum(axis=(1, 2))


def test_cem_rosenbrock():
    lb = [[-2.0, -2.0]]
    ub = [[2.0, 2.0]]
    opt = CEMOptimizer(
        num_iterations=100, elite_ratio=0.1, population_size=500,
        lower_bound=lb, upper_bound=ub, alpha=0.1,
    )
    x0 = jnp.zeros((1, 2))
    best, _ = opt.optimize(neg_rosenbrock, x0, jax.random.PRNGKey(0))
    value = float(neg_rosenbrock(jnp.asarray(best)[None])[0])
    best = np.asarray(best)[0]
    # CEM lands on the valley floor: objective near the optimum (0 at (1,1))
    assert value > -0.1, (best, value)
    np.testing.assert_allclose(best[1], best[0] ** 2, atol=0.05)  # on the valley


def test_cem_clipped_normal_and_mean_elites():
    lb = [[-1.0]] * 3
    ub = [[1.0]] * 3
    opt = CEMOptimizer(
        5, 0.2, 200, lb, ub, alpha=0.0, return_mean_elites=True, clipped_normal=True
    )
    center = 0.3 * jnp.ones((3, 1))
    best, _ = opt.optimize(quadratic_obj, jnp.zeros((3, 1)), jax.random.PRNGKey(0),
                           obj_args=(center,))
    np.testing.assert_allclose(np.asarray(best), 0.3, atol=0.1)


def test_cem_respects_bounds():
    lb = [[-0.5]] * 4
    ub = [[0.25]] * 4
    opt = CEMOptimizer(5, 0.1, 100, lb, ub, alpha=0.1)
    seen = []

    def obj(pop, *a):
        seen.append(pop)
        return -jnp.square(pop - 10.0).sum(axis=(1, 2))  # optimum far above ub

    best, _ = opt.optimize(obj, jnp.zeros((4, 1)), jax.random.PRNGKey(0))
    assert np.all(np.asarray(best) <= 0.25 + 1e-5)
    assert np.all(np.asarray(best) >= -0.5 - 1e-5)


def test_cem_nan_guard():
    lb = [[-1.0]]
    ub = [[1.0]]
    opt = CEMOptimizer(3, 0.2, 50, lb, ub, alpha=0.1)

    def obj(pop, *a):
        vals = -jnp.square(pop).sum(axis=(1, 2))
        return jnp.where(pop[:, 0, 0] > 0, jnp.nan, vals)  # half the pop is NaN

    best, _ = opt.optimize(obj, jnp.zeros((1, 1)), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(best)).all()


def test_mppi_quadratic_and_state_shift():
    h, a = 5, 2
    lb = [[-1.0] * a] * h
    ub = [[1.0] * a] * h
    opt = MPPIOptimizer(
        num_iterations=10, population_size=300, gamma=10.0, sigma=0.8, beta=0.7,
        lower_bound=lb, upper_bound=ub,
    )
    center = 0.4 * jnp.ones((h, a))
    state = opt.init_state()
    # repeated MPC calls thread the persistent mean; it should hover near the
    # center (the reference's MPPI keeps unit exploration noise, so individual
    # entries stay noisy — assert on the mean over elements and calls)
    sols = []
    for i in range(10):
        sol, state = opt.optimize(
            quadratic_obj, None, jax.random.PRNGKey(i), state, obj_args=(center,)
        )
        sols.append(np.asarray(sol))
    tail = np.stack(sols[3:])
    assert abs(tail.mean() - 0.4) < 0.1, tail.mean()
    assert np.all(tail <= 1.0) and np.all(tail >= -1.0)


def test_icem_rosenbrock():
    lb = [[-2.0, -2.0]]
    ub = [[2.0, 2.0]]
    opt = ICEMOptimizer(
        num_iterations=30, elite_ratio=0.1, population_size=400,
        population_decay_factor=1.25, colored_noise_exponent=0.25,
        lower_bound=lb, upper_bound=ub, keep_elite_frac=0.1, alpha=0.1,
    )
    best, opt_state = opt.optimize(
        neg_rosenbrock, jnp.zeros((1, 2)), jax.random.PRNGKey(0)
    )
    value = float(neg_rosenbrock(jnp.asarray(best)[None])[0])
    best = np.asarray(best)[0]
    assert value > -0.15, (best, value)  # on the valley floor near the optimum
    np.testing.assert_allclose(best[1], best[0] ** 2, atol=0.05)
    # persistent elite state
    assert bool(opt_state["valid"])
    assert opt_state["elite"].shape[0] == opt.elite_num
    best2, _ = opt.optimize(
        neg_rosenbrock, jnp.zeros((1, 2)), jax.random.PRNGKey(1), opt_state
    )
    assert np.isfinite(np.asarray(best2)).all()


def test_icem_population_module_rounding():
    opt = ICEMOptimizer(
        3, 0.1, 100, 1.3, 2.0, [[-1.0]] * 4, [[1.0]] * 4, 0.1, 0.1,
        population_size_module=7,
    )
    assert all(p % 7 == 0 for p in opt.decay_population_sizes)
    assert opt.keep_elite_size % 7 == 0


def test_trajectory_optimizer_warm_start():
    lb = np.array([-1.0])
    ub = np.array([1.0])
    cem = CEMOptimizer(5, 0.1, 100, [[-1.0]] * 6, [[1.0]] * 6, alpha=0.1)
    topt = TrajectoryOptimizer(cem, lb, ub, planning_horizon=6, replan_freq=2)
    center = 0.5 * jnp.ones((6, 1))
    sol = topt.optimize(quadratic_obj, jax.random.PRNGKey(0), obj_args=(center,))
    assert sol.shape == (6, 1)
    # warm start shifted by replan_freq, tail filled with initial solution (0)
    prev = np.asarray(topt.previous_solution)
    np.testing.assert_allclose(prev[:4], sol[2:], atol=1e-6)
    np.testing.assert_allclose(prev[4:], 0.0, atol=1e-6)
    topt.reset()
    np.testing.assert_allclose(np.asarray(topt.previous_solution), 0.0)


def test_trajectory_optimizer_agent_caching():
    cem = CEMOptimizer(4, 0.1, 60, [[-1.0]] * 4, [[1.0]] * 4, alpha=0.1)
    agent = TrajectoryOptimizerAgent(
        cem, action_lb=[-1.0], action_ub=[1.0], planning_horizon=4, replan_freq=2
    )
    def eval_fn(action_sequences, eval_state, obs, key):
        return -jnp.square(action_sequences - 0.25).sum(axis=(1, 2))

    agent.set_trajectory_eval_fn(eval_fn)
    # count actual planner invocations via the fused-dispatch plan counter
    obs = np.zeros(2, np.float32)
    a1 = agent.act(obs)
    a2 = agent.act(obs)  # cached, no new plan
    assert agent._act_counter == 1
    a3 = agent.act(obs)  # replan
    assert agent._act_counter == 2
    assert a1.shape == (1,)
    np.testing.assert_allclose(a1, 0.25, atol=0.15)

    plan = agent.plan(obs)
    assert plan.shape == (4, 1)

    with pytest.raises(RuntimeError):
        TrajectoryOptimizerAgent(cem, [-1.0], [1.0]).act(obs)


def test_agent_act_batch_plans_w_envs_in_one_dispatch():
    """act_batch: one program plans W independent MPC actions with per-env
    warm starts / optimizer state / PRNG streams; reset_mask clears one env's
    planner state at an episode boundary."""
    cem = CEMOptimizer(4, 0.2, 60, [[-1.0]] * 4, [[1.0]] * 4, alpha=0.1)
    agent = TrajectoryOptimizerAgent(
        cem, action_lb=[-1.0], action_ub=[1.0], planning_horizon=4, replan_freq=2
    )

    # per-env optimum depends on the observation: best action = obs[0]
    def eval_fn(action_sequences, eval_state, obs, key):
        return -jnp.square(action_sequences - obs[0]).sum(axis=(1, 2))

    agent.set_trajectory_eval_fn(eval_fn)
    obs = np.array([[0.3, 0.0], [-0.5, 0.0], [0.0, 0.0]], np.float32)
    a1 = agent.act_batch(obs)
    assert a1.shape == (3, 1)
    a2 = agent.act_batch(obs)  # cached row (replan_freq=2): no new plan
    assert agent._batch_state["counter"] == 1
    a3 = agent.act_batch(obs)
    assert agent._batch_state["counter"] == 2
    # each env converged toward its own optimum
    np.testing.assert_allclose(a3[:, 0], obs[:, 0], atol=0.25)
    # boundary reset for env 1 only
    agent.act_batch(obs, reset_mask=np.array([False, True, False]))
    # pool-style dispatch through act(batched=True)
    a4 = agent.act(obs, batched=True)
    assert a4.shape == (3, 1)

    # stateful optimizer: per-env iCEM elite sets thread through act_batch
    icem = ICEMOptimizer(
        3, 0.2, 40, population_decay_factor=1.3, colored_noise_exponent=2.0,
        keep_elite_frac=0.5, alpha=0.1,
        lower_bound=[[-1.0]] * 4, upper_bound=[[1.0]] * 4,
    )
    agent_i = TrajectoryOptimizerAgent(
        icem, action_lb=[-1.0], action_ub=[1.0], planning_horizon=4, replan_freq=1
    )
    agent_i.set_trajectory_eval_fn(eval_fn)
    for _ in range(4):
        ai = agent_i.act_batch(obs)
    np.testing.assert_allclose(ai[:, 0], obs[:, 0], atol=0.3)
    st = agent_i._batch_state
    assert bool(np.asarray(st["opt_state"]["valid"]).all())  # (W,) elite flags


def test_agent_act_batch_with_worker_pool():
    """A planner agent feeds EnvWorkerPool.collect via batched acting —
    the PETS-side counterpart of the SAC collection path."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_algorithms import MockLineEnv

    from mbrl_tpu.parallel.env_workers import EnvWorkerPool
    from mbrl_tpu.util.replay_buffer import ReplayBuffer

    cem = CEMOptimizer(2, 0.2, 30, [[-1.0]] * 3, [[1.0]] * 3, alpha=0.1)
    agent = TrajectoryOptimizerAgent(
        cem, action_lb=[-1.0], action_ub=[1.0], planning_horizon=3, replan_freq=1
    )

    def eval_fn(action_sequences, eval_state, obs, key):
        # drive position toward 0: reward = -(pos + vel + a)^2 proxy
        pred = obs[0] + obs[1] + action_sequences[:, :, 0].cumsum(axis=1)
        return -jnp.square(pred).sum(axis=1)

    agent.set_trajectory_eval_fn(eval_fn)
    pool = EnvWorkerPool(MockLineEnv, num_workers=3, seed=0)
    try:
        buf = ReplayBuffer(500, (2,), (1,))
        pool.collect(agent, 10, replay_buffer=buf)
        assert len(buf) == 30
        assert np.isfinite(buf.get_all().act).all()
    finally:
        pool.close()


def test_optimizer_callbacks_invoked_per_iteration():
    """Parity: reference trajectory_opt.py:146-175 — optimize(callback=) is called
    once per iteration with (population, values, iteration_index)."""
    calls = []

    def cb(population, values, it):
        calls.append((np.asarray(population).shape, np.asarray(values).shape, int(it)))

    lb = [[-1.0]] * 3
    ub = [[1.0]] * 3
    center = 0.3 * jnp.ones((3, 1))

    opt = CEMOptimizer(4, 0.2, 50, lb, ub, alpha=0.1)
    sol, _ = opt.optimize(
        quadratic_obj, jnp.zeros((3, 1)), jax.random.PRNGKey(0),
        obj_args=(center,), callback=cb,
    )
    jax.effects_barrier()
    assert [c[2] for c in calls] == [0, 1, 2, 3]
    assert all(c[0] == (50, 3, 1) and c[1] == (50,) for c in calls)

    calls.clear()
    mppi = MPPIOptimizer(3, 40, gamma=1.0, sigma=0.5, beta=0.7,
                         lower_bound=lb, upper_bound=ub)
    mppi.optimize(quadratic_obj, jnp.zeros((3, 1)), jax.random.PRNGKey(0),
                  obj_args=(center,), callback=cb)
    jax.effects_barrier()
    assert [c[2] for c in calls] == [0, 1, 2]

    calls.clear()
    icem = ICEMOptimizer(
        num_iterations=3, elite_ratio=0.1, population_size=60,
        population_decay_factor=1.3, colored_noise_exponent=2.0,
        lower_bound=lb, upper_bound=ub, keep_elite_frac=0.3, alpha=0.1,
    )
    icem.optimize(quadratic_obj, jnp.zeros((3, 1)), jax.random.PRNGKey(0),
                  obj_args=(center,), callback=cb)
    jax.effects_barrier()
    assert [c[2] for c in calls] == [0, 1, 2]
    # iCEM population sizes decay per iteration (plus kept elites / appended mean)
    assert calls[0][0][0] >= calls[1][0][0]


def test_agent_act_optimizer_callback():
    """TrajectoryOptimizerAgent.act/plan forward optimizer_callback (reference
    trajectory_opt.py:656-685)."""
    lb = [-1.0]
    ub = [1.0]
    agent = TrajectoryOptimizerAgent(
        CEMOptimizer(3, 0.2, 30, [[-1.0]] * 4, [[1.0]] * 4, alpha=0.1),
        action_lb=lb, action_ub=ub, planning_horizon=4, replan_freq=1,
    )
    center = 0.5 * jnp.ones((4, 1))

    def eval_fn(population, _state, _obs, _key):
        return quadratic_obj(population, center)

    agent.set_trajectory_eval_fn(eval_fn)
    seen = []
    agent.act(np.zeros(3), optimizer_callback=lambda p, v, i: seen.append(int(i)))
    jax.effects_barrier()
    assert seen == [0, 1, 2]


def test_agent_use_prng_impl_rbg():
    """`algorithm.planning_prng_impl=rbg` path (PERF_NOTES r5c decomposition:
    threefry sampling is ~12% of a rollout step; rbg keys recover roughly
    half). The rbg impl must thread through the whole jitted planning
    program — act() still plans, caches, and solves the toy objective."""
    cem = CEMOptimizer(4, 0.1, 60, [[-1.0]] * 4, [[1.0]] * 4, alpha=0.1)
    agent = TrajectoryOptimizerAgent(
        cem, action_lb=[-1.0], action_ub=[1.0], planning_horizon=4, replan_freq=2
    )

    def eval_fn(action_sequences, eval_state, obs, key):
        # consume the key the way a stochastic model rollout would
        noise = jax.random.normal(key, (action_sequences.shape[0],)) * 1e-3
        return -jnp.square(action_sequences - 0.25).sum(axis=(1, 2)) + noise

    agent.set_trajectory_eval_fn(eval_fn)
    agent.use_prng_impl("rbg")
    assert str(jax.random.key_impl(agent._key)) == "rbg"
    a1 = agent.act(np.zeros(2, np.float32))
    assert a1.shape == (1,)
    np.testing.assert_allclose(a1, 0.25, atol=0.15)
    # keys split inside the program inherit the impl; replan still works
    agent.act(np.ones(2, np.float32))
    assert agent._act_counter >= 1
    assert np.isfinite(np.asarray(a1)).all()
