"""Soft Actor-Critic learner, written from scratch as pure jitted programs.

Capability parity with the reference's vendored learner
``mbrl/third_party/pytorch_sac_pranz24`` (twin-Q critic model.py:36-63, tanh-squashed
Gaussian policy with log-prob correction model.py:66-113, deterministic policy
variant, soft target updates utils.py, update_parameters sac.py:76-173 with optional
automatic entropy tuning, checkpoint save/load sac.py:176-213).

TPU re-design: all learner state (policy/critic/target params, log-alpha, optimizer
states, update counter) is one ``SACState`` pytree; a single jitted ``update_step``
does critic + policy + alpha updates and the (periodic) soft target update with
``lax.cond``-free masking, so MBPO can run thousands of SAC updates per env step as
one scanned on-device program (``update_many``).
"""
from __future__ import annotations

import pathlib
import pickle
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mbrl_tpu.planning.core import Agent

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -20.0
EPS = 1e-6


def _mlp_init(key, sizes):
    params = []
    for i in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        bound = 1.0 / np.sqrt(sizes[i])
        w = jax.random.uniform(k, (sizes[i], sizes[i + 1]), minval=-bound, maxval=bound)
        params.append({"w": w, "b": jnp.zeros((sizes[i + 1],))})
    return params


def _mlp_apply(params, x, final_linear=True):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1 or not final_linear:
            x = jax.nn.relu(x)
    return x


@struct.dataclass
class SACState:
    policy: Any
    critic: Any
    critic_target: Any
    log_alpha: jax.Array
    policy_opt: Any
    critic_opt: Any
    alpha_opt: Any
    updates: jax.Array  # int32 counter


class SAC:
    """Twin-Q SAC with a tanh-Gaussian (or deterministic) policy."""

    def __init__(
        self,
        num_inputs: int,
        action_space,
        gamma: float = 0.99,
        tau: float = 0.005,
        alpha: float = 0.2,
        policy: str = "Gaussian",
        target_update_interval: int = 1,
        automatic_entropy_tuning: bool = True,
        hidden_size: int = 256,
        lr: float = 3e-4,
        target_entropy: Optional[float] = None,
    ):
        self.num_inputs = num_inputs
        self.act_dim = action_space.shape[0]
        self.gamma = gamma
        self.tau = tau
        self.init_alpha = alpha
        self.policy_type = policy
        self.target_update_interval = target_update_interval
        self.automatic_entropy_tuning = automatic_entropy_tuning and policy == "Gaussian"
        self.hidden_size = hidden_size
        self.lr = lr
        if target_entropy is None:
            target_entropy = -float(self.act_dim)
        self.target_entropy = float(target_entropy)

        low = np.asarray(action_space.low, np.float32)
        high = np.asarray(action_space.high, np.float32)
        self.action_scale = jnp.asarray((high - low) / 2.0)
        self.action_bias = jnp.asarray((high + low) / 2.0)

        self.policy_optimizer = optax.adam(lr)
        self.critic_optimizer = optax.adam(lr)
        self.alpha_optimizer = optax.adam(lr)

        self._update_step = jax.jit(self._update_impl)
        self._update_many = jax.jit(self._update_many_impl)
        self._act = jax.jit(self._act_impl, static_argnames=("sample",))

    # ------------------------------------------------------------------ #
    # Init
    # ------------------------------------------------------------------ #
    def init(self, key: jax.Array) -> SACState:
        k_pi, k_q1, k_q2 = jax.random.split(key, 3)
        h = self.hidden_size
        head_mult = 2 if self.policy_type == "Gaussian" else 1
        policy = _mlp_init(k_pi, [self.num_inputs, h, h, head_mult * self.act_dim])
        critic = {
            "q1": _mlp_init(k_q1, [self.num_inputs + self.act_dim, h, h, 1]),
            "q2": _mlp_init(k_q2, [self.num_inputs + self.act_dim, h, h, 1]),
        }
        return SACState(
            policy=policy,
            critic=critic,
            critic_target=jax.tree_util.tree_map(jnp.copy, critic),
            log_alpha=jnp.log(jnp.float32(self.init_alpha)),
            policy_opt=self.policy_optimizer.init(policy),
            critic_opt=self.critic_optimizer.init(critic),
            alpha_opt=self.alpha_optimizer.init(jnp.zeros(())),
            updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ #
    # Policy
    # ------------------------------------------------------------------ #
    def _policy_dist(self, policy_params, obs):
        out = _mlp_apply(policy_params, obs)
        if self.policy_type == "Gaussian":
            mean, log_std = jnp.split(out, 2, axis=-1)
            log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
            return mean, log_std
        return out, None

    def _sample_action(self, policy_params, obs, key):
        """Reparameterized tanh-Gaussian sample -> (action, log_prob, mean_action)."""
        mean, log_std = self._policy_dist(policy_params, obs)
        if log_std is None:  # deterministic policy with exploration noise
            # reference pranz24 clamps the noise to (-0.25, 0.25); also keep the
            # emitted action inside the action space
            noise = jnp.clip(jax.random.normal(key, mean.shape) * 0.1, -0.25, 0.25)
            action = jnp.tanh(mean) * self.action_scale + self.action_bias
            noisy = jnp.clip(
                action + noise,
                self.action_bias - self.action_scale,
                self.action_bias + self.action_scale,
            )
            return noisy, jnp.zeros(mean.shape[:-1] + (1,)), action
        std = jnp.exp(log_std)
        x = mean + std * jax.random.normal(key, mean.shape)
        y = jnp.tanh(x)
        action = y * self.action_scale + self.action_bias
        # Gaussian log-prob with tanh-squash correction
        logp = -0.5 * (jnp.square((x - mean) / std) + 2 * log_std + jnp.log(2 * jnp.pi))
        logp = logp - jnp.log(self.action_scale * (1 - jnp.square(y)) + EPS)
        logp = logp.sum(axis=-1, keepdims=True)
        mean_action = jnp.tanh(mean) * self.action_scale + self.action_bias
        return action, logp, mean_action

    def _act_impl(self, policy_params, obs, key, sample: bool = True):
        action, _, mean_action = self._sample_action(policy_params, obs, key)
        return action if sample else mean_action

    def select_action(
        self, state: SACState, obs: np.ndarray, key: jax.Array, evaluate: bool = False
    ) -> np.ndarray:
        obs = jnp.asarray(obs, jnp.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        act = self._act(state.policy, obs, key, sample=not evaluate)
        act = np.asarray(act)
        return act[0] if squeeze else act

    # ------------------------------------------------------------------ #
    # Updates
    # ------------------------------------------------------------------ #
    def _q_values(self, critic, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return _mlp_apply(critic["q1"], x), _mlp_apply(critic["q2"], x)

    def _update_impl(self, state: SACState, batch, key: jax.Array):
        obs, act, next_obs, reward, mask = batch
        k_next, k_pi = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        # --- critic update ---
        next_action, next_logp, _ = self._sample_action(state.policy, next_obs, k_next)
        q1_t, q2_t = self._q_values(state.critic_target, next_obs, next_action)
        min_q_next = jnp.minimum(q1_t, q2_t) - alpha * next_logp
        target_q = reward + mask * self.gamma * min_q_next
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(critic):
            q1, q2 = self._q_values(critic, obs, act)
            return jnp.mean(jnp.square(q1 - target_q)) + jnp.mean(
                jnp.square(q2 - target_q)
            )

        critic_loss, critic_grads = jax.value_and_grad(critic_loss_fn)(state.critic)
        critic_updates, critic_opt = self.critic_optimizer.update(
            critic_grads, state.critic_opt, state.critic
        )
        critic = optax.apply_updates(state.critic, critic_updates)

        # --- policy update ---
        def policy_loss_fn(policy):
            pi, logp, _ = self._sample_action(policy, obs, k_pi)
            q1_pi, q2_pi = self._q_values(critic, obs, pi)
            min_q_pi = jnp.minimum(q1_pi, q2_pi)
            return jnp.mean(alpha * logp - min_q_pi), logp

        (policy_loss, logp), policy_grads = jax.value_and_grad(
            policy_loss_fn, has_aux=True
        )(state.policy)
        policy_updates, policy_opt = self.policy_optimizer.update(
            policy_grads, state.policy_opt, state.policy
        )
        policy = optax.apply_updates(state.policy, policy_updates)

        # --- alpha update ---
        if self.automatic_entropy_tuning:

            def alpha_loss_fn(log_alpha):
                return -jnp.mean(
                    log_alpha * jax.lax.stop_gradient(logp + self.target_entropy)
                )

            alpha_loss, alpha_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
            alpha_updates, alpha_opt = self.alpha_optimizer.update(
                alpha_grad, state.alpha_opt, state.log_alpha
            )
            log_alpha = optax.apply_updates(state.log_alpha, alpha_updates)
        else:
            alpha_loss = jnp.zeros(())
            alpha_opt = state.alpha_opt
            log_alpha = state.log_alpha

        # --- periodic soft target update (masked, no host sync) ---
        updates = state.updates + 1
        do_update = (updates % self.target_update_interval) == 0
        tau = jnp.where(do_update, self.tau, 0.0)
        critic_target = jax.tree_util.tree_map(
            lambda t, s: (1 - tau) * t + tau * s, state.critic_target, critic
        )

        new_state = SACState(
            policy=policy,
            critic=critic,
            critic_target=critic_target,
            log_alpha=log_alpha,
            policy_opt=policy_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
            updates=updates,
        )
        metrics = {
            "critic_loss": critic_loss,
            "policy_loss": policy_loss,
            "alpha_loss": alpha_loss,
            "alpha": alpha,
        }
        return new_state, metrics

    def update_parameters(
        self, state: SACState, batch, key: jax.Array
    ) -> Tuple[SACState, Dict[str, jax.Array]]:
        """One SAC update from a (obs, act, next_obs, reward, mask) device batch.
        ``mask`` is 1-terminated (i.e. 0 where the episode ended)."""
        return self._update_step(state, batch, key)

    def _update_many_impl(self, state: SACState, batches, key: jax.Array):
        """Scan N updates over stacked batches (leading axis = update index)."""

        def step(carry, batch):
            st, key = carry
            key, k = jax.random.split(key)
            st, metrics = self._update_impl(st, batch, k)
            return (st, key), metrics

        (state, _), metrics = jax.lax.scan(step, (state, key), batches)
        return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

    def update_many(self, state: SACState, batches, key: jax.Array):
        return self._update_many(state, batches, key)

    def _update_from_buffer_impl(
        self, state: SACState, buf_state, key, num_updates: int, batch_size: int
    ):
        """Sample ``num_updates`` batches from a DeviceBufferState and run the
        scanned updates — ONE program, so the MBPO env loop enqueues a single
        device call per step with no host round trips (the key is carried on
        device and returned for the next call)."""
        key, k_idx, k_upd = jax.random.split(key, 3)
        idx = jax.random.randint(
            k_idx, (num_updates, batch_size), 0, jnp.maximum(buf_state.num_stored, 1)
        )
        batches = (
            buf_state.obs[idx],
            buf_state.act[idx],
            buf_state.next_obs[idx],
            buf_state.reward[idx],
            buf_state.mask[idx],
        )
        new_state, metrics = self._update_many_impl(state, batches, k_upd)
        return new_state, key, metrics

    def update_from_buffer(
        self, state: SACState, buf_state, key, num_updates: int, batch_size: int
    ):
        if not hasattr(self, "_update_from_buffer"):
            self._update_from_buffer = jax.jit(
                self._update_from_buffer_impl,
                static_argnames=("num_updates", "batch_size"),
            )
        return self._update_from_buffer(
            state, buf_state, key, num_updates=num_updates, batch_size=batch_size
        )

    # ------------------------------------------------------------------ #
    # Persistence
    # ------------------------------------------------------------------ #
    def save_checkpoint(self, state: SACState, ckpt_path) -> None:
        host = jax.device_get(state)
        with open(ckpt_path, "wb") as f:
            pickle.dump(host, f)

    def load_checkpoint(self, ckpt_path) -> SACState:
        with open(ckpt_path, "rb") as f:
            host = pickle.load(f)
        return jax.tree_util.tree_map(jnp.asarray, host)

    def load_torch_checkpoint(self, ckpt_path) -> SACState:
        """Load a REFERENCE-format torch checkpoint into a fresh SACState.

        The reference saves ``{policy,critic,critic_target}_state_dict`` of its
        pranz24 modules (mbrl/third_party/pytorch_sac_pranz24/sac.py:176-192;
        GaussianPolicy = linear1/linear2 trunk + mean_linear/log_std_linear
        heads, QNetwork = twin linear1-3 / linear4-6 chains, model.py:36-114).
        This converts those tensors into this learner's pytree layout (the
        Gaussian head concatenates [mean | log_std] into one matrix), so agents
        trained with the reference library keep acting identically here.
        Adam moments are NOT transferred (optimizer state is
        framework-specific); optimizers and the alpha restart fresh.
        """
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)

        def lin(sd, name):
            return {
                "w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
            }

        pol = ckpt["policy_state_dict"]
        trunk = [lin(pol, "linear1"), lin(pol, "linear2")]
        if self.policy_type == "Gaussian":
            mean_l = lin(pol, "mean_linear")
            std_l = lin(pol, "log_std_linear")
            head = {
                "w": jnp.concatenate([mean_l["w"], std_l["w"]], axis=1),
                "b": jnp.concatenate([mean_l["b"], std_l["b"]], axis=0),
            }
        else:
            head = lin(pol, "mean")
        policy = trunk + [head]

        def critic_params(sd):
            return {
                "q1": [lin(sd, "linear1"), lin(sd, "linear2"), lin(sd, "linear3")],
                "q2": [lin(sd, "linear4"), lin(sd, "linear5"), lin(sd, "linear6")],
            }

        critic = critic_params(ckpt["critic_state_dict"])
        return SACState(
            policy=policy,
            critic=critic,
            critic_target=critic_params(ckpt["critic_target_state_dict"]),
            log_alpha=jnp.log(jnp.float32(self.init_alpha)),
            policy_opt=self.policy_optimizer.init(policy),
            critic_opt=self.critic_optimizer.init(critic),
            alpha_opt=self.alpha_optimizer.init(jnp.zeros(())),
            updates=jnp.zeros((), jnp.int32),
        )


class SACAgent(Agent):
    """Adapts the SAC learner to the Agent.act API (parity:
    mbrl/planning/sac_wrapper.py:13-46).

    TPU re-design: ``act`` runs the tiny policy MLP on the HOST CPU backend
    against a mirrored copy of the policy params. Every env step needs the action
    on the host, so acting on the accelerator costs a full device round trip per
    step (~hundreds of ms over a remote-device link); the CPU forward is ~0.2 ms.
    ``set_state`` starts an ASYNC device->host copy of the new policy; the next
    ``act`` harvests it — by then the copy has had the whole env step to complete,
    so the policy used at step t+1 reflects all updates through step t, exactly
    the reference's semantics (mbrl/algorithms/mbpo.py:210-273) with the transfer
    latency hidden behind host work."""

    def __init__(self, sac: SAC, state: SACState, seed: int = 0,
                 host_actor: bool = True, refresh_age: int = 1):
        self.sac = sac
        self.state = state
        self._host_actor = host_actor
        # Harvest a pending async policy copy only after it has had
        # ``refresh_age`` acts' worth of wall time to land: refresh_age=1 means
        # the policy at step t+1 reflects all updates through step t (exact
        # reference interleaving, but each act may block on the transfer);
        # larger values bound staleness to ~2*refresh_age env steps while the
        # act path never blocks on the device link (the right trade over a
        # high-latency remote-device tunnel).
        self._refresh_age = max(int(refresh_age), 1)
        self._cpu = jax.devices("cpu")[0]
        if host_actor:
            self._key = jax.device_put(jax.random.PRNGKey(seed), self._cpu)
        else:
            self._key = jax.random.PRNGKey(seed)
        self._host_policy = None
        self._pending = None
        self._pending_age = 0

    def set_state(self, state: SACState) -> None:
        self.state = state
        if self._host_actor and self._pending is None:
            jax.tree_util.tree_map(_maybe_copy_async, state.policy)
            self._pending = state.policy
            self._pending_age = 0

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _ensure_host_policy(self):
        if self._host_policy is None:  # first act: synchronous fetch
            if self._pending is None:
                self._pending = self.state.policy
            self._host_policy = jax.device_put(
                jax.device_get(self._pending), self._cpu
            )
            self._pending = None
        elif self._pending is not None:
            self._pending_age += 1
            if self._pending_age >= self._refresh_age:
                self._host_policy = jax.device_put(
                    jax.device_get(self._pending), self._cpu
                )
                self._pending = None
        return self._host_policy

    def act(
        self, obs: np.ndarray, sample: bool = False, batched: bool = False, **kwargs
    ) -> np.ndarray:
        if not self._host_actor:
            return self.sac.select_action(
                self.state, obs, self._next_key(), evaluate=not sample
            )
        policy = self._ensure_host_policy()
        obs = jax.device_put(np.asarray(obs, np.float32), self._cpu)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        act = self.sac._act(policy, obs, self._next_key(), sample=sample)
        act = np.asarray(act)
        return act[0] if squeeze else act


def _maybe_copy_async(leaf):
    try:
        leaf.copy_to_host_async()
    except AttributeError:
        pass
    return leaf
