"""PlaNet: recurrent state-space world model from pixels (Hafner et al., 2019).

Capability parity with the reference ``mbrl/models/planet.py:120-683``: GRU belief
model h_t = f(h_{t-1}, s_{t-1}, a_{t-1}) (:82-100), prior p(s|h) and posterior
q(s|o,h) MLP heads with softplus+min_std (:103-114, :231-252), conv pixel
encoder/decoder, reward head on [h, s] (:259-265), pixel-MSE + reward-MSE +
free-nats-clamped KL loss (:406-482), grad clipping (:484-519), posterior tracking
for acting (:592-664), prior sampling for latent planning (:531-581), decoding
(`render`, :666-683), Keras-style init (:20-29).

TPU re-design:
  - the trajectory unroll is a ``lax.scan`` over time (the reference uses a Python
    loop per step, :370-402), so one RSSM training step is one XLA program;
  - the decoder step is wrapped in ``jax.checkpoint`` (rematerialization) so the
    L=50 x B=50 pixel reconstruction unroll fits memory (SURVEY.md §7 hard parts);
  - the "internal posterior state machine" becomes an explicit slot in the model
    state dict (``state["posterior"]``) threaded functionally; randomness is keys.

Implements the same wrapper protocol as TransitionRewardModel (reset/sample/loss/
eval_score over a state dict), so ModelEnv and ModelTrainer drive it unchanged.
"""
from __future__ import annotations

import math
import pathlib
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.models.conv_nets import Conv2dDecoder, Conv2dEncoder
from mbrl_tpu.types import TransitionBatch

_PARAMS_FNAME = "planet.pkl"


def _xavier(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _orthogonal(key, shape):
    a = jax.random.normal(key, shape)
    q, r = jnp.linalg.qr(a)
    return q * jnp.sign(jnp.diagonal(r))


def _linear(key, in_f, out_f):
    return {"w": _xavier(key, (in_f, out_f)), "b": jnp.zeros((out_f,))}


def _apply_mlp(layers, x, act=jax.nn.relu):
    for i, l in enumerate(layers):
        x = x @ l["w"] + l["b"]
        if i < len(layers) - 1:
            x = act(x)
    return x


def _gru_init(key, in_size, hid):
    k1, k2 = jax.random.split(key)
    # torch GRUCell layout: W_ih (3h, in), W_hh (3h, h) in (r, z, n) gate order
    w_ih = _xavier(k1, (in_size, 3 * hid))
    w_hh = jnp.concatenate(
        [_orthogonal(jax.random.fold_in(k2, i), (hid, hid)) for i in range(3)], axis=1
    )
    return {
        "w_ih": w_ih,
        "w_hh": w_hh,
        "b_ih": jnp.zeros((3 * hid,)),
        "b_hh": jnp.zeros((3 * hid,)),
    }


def _gru_apply(p, x, h):
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


class PlaNetModel:
    """RSSM world model with the TransitionRewardModel wrapper protocol."""

    def __init__(
        self,
        obs_shape: Tuple[int, int, int],
        obs_encoding_size: int,
        encoder_config,
        decoder_config,
        latent_state_size: int,
        action_size: int,
        belief_size: int,
        hidden_size_fcs: int,
        min_std: float = 0.1,
        free_nats: float = 3.0,
        kl_scale: float = 1.0,
        grad_clip_norm: float = 1000.0,
        matmul_precision: str = "highest",
    ):
        self.obs_shape = tuple(obs_shape)
        self.latent_state_size = latent_state_size
        self.action_size = action_size
        self.belief_size = belief_size
        self.hidden_size_fcs = hidden_size_fcs
        self.min_std = min_std
        self.free_nats = free_nats
        self.kl_scale = kl_scale
        self.grad_clip_norm = grad_clip_norm
        # On TPU, f32 matmuls/convs default to one bf16 pass. The round-2 on-chip
        # RSSM training diverged to NaN within the first episodes under that
        # default while the identical program is stable on CPU (f32), so the
        # RSSM compute path pins full-f32 matmul precision. The RSSM's matmuls
        # are narrow (belief/hidden 200) — the extra passes are noise next to the
        # conv encoder/decoder, and stability is worth far more than the delta.
        self.matmul_precision = matmul_precision
        self.num_elites = 1
        self.stochastic_loss = True  # trainer threads PRNG keys into loss()

        self.encoder = Conv2dEncoder(
            encoder_config, self.obs_shape[1:], obs_encoding_size
        )
        self.decoder = Conv2dDecoder(
            latent_state_size + belief_size, decoder_config[0], decoder_config[1]
        )
        self._obs_encoding_size = obs_encoding_size

    def __len__(self) -> int:
        return 1

    # ------------------------------------------------------------------ #
    # Params / state
    # ------------------------------------------------------------------ #
    def init(self, key: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(key, 12)
        s, h, a, fc = (
            self.latent_state_size,
            self.belief_size,
            self.action_size,
            self.hidden_size_fcs,
        )
        params = {
            "belief_embed": _linear(keys[0], s + a, h),
            "belief_gru": _gru_init(keys[1], h, h),
            "prior": [_linear(keys[2], h, fc), _linear(keys[3], fc, 2 * s)],
            "encoder": self.encoder.init(keys[4]),
            "posterior": [
                _linear(keys[5], self._obs_encoding_size + h, fc),
                _linear(keys[6], fc, 2 * s),
            ],
            "decoder": self.decoder.init(keys[7]),
            "reward": [
                _linear(keys[8], h + s, fc),
                _linear(keys[9], fc, fc),
                _linear(keys[10], fc, 1),
            ],
        }
        return {
            "params": params,
            "normalizer": None,
            # explicit posterior-tracking slot (the reference's internal
            # _current_posterior_sample/_current_belief attributes)
            "posterior": {
                "latent": jnp.zeros((1, s)),
                "belief": jnp.zeros((1, h)),
            },
        }

    # ------------------------------------------------------------------ #
    # Pieces
    # ------------------------------------------------------------------ #
    def _process_pixel_obs(self, obs: jax.Array) -> jax.Array:
        return obs.astype(jnp.float32) / 256.0 - 0.5

    def _belief(self, params, latent, action, belief):
        emb = jax.nn.relu(
            jnp.concatenate([latent, action], axis=-1) @ params["belief_embed"]["w"]
            + params["belief_embed"]["b"]
        )
        return _gru_apply(params["belief_gru"], emb, belief)

    def _mean_std(self, raw):
        mean = raw[..., : self.latent_state_size]
        std = jax.nn.softplus(raw[..., self.latent_state_size :]) + self.min_std
        return mean, std

    def _prior(self, params, belief):
        return self._mean_std(_apply_mlp(params["prior"], belief))

    def _posterior(self, params, belief, obs_encoding):
        x = jnp.concatenate([belief, obs_encoding], axis=-1)
        return self._mean_std(_apply_mlp(params["posterior"], x))

    def _reward(self, params, belief, latent):
        return _apply_mlp(params["reward"], jnp.concatenate([belief, latent], axis=-1))

    def _decode(self, params, latent, belief):
        return self.decoder.apply(
            params["decoder"], jnp.concatenate([latent, belief], axis=-1)
        )

    # ------------------------------------------------------------------ #
    # Training forward / loss
    # ------------------------------------------------------------------ #
    def _prec(self):
        """Trace-time matmul/conv precision pin for the RSSM compute path."""
        return jax.default_matmul_precision(self.matmul_precision)

    def unroll(self, params, next_obs, action, key, deterministic: bool = False):
        """Scan the RSSM over a trajectory.

        next_obs: (B, L, C, H, W) already pixel-processed; action: (B, L, A).
        Returns dict of (B, L, ...) stacks: prior/posterior (mean, std, sample),
        beliefs, reconstructions, predicted rewards. ``deterministic=True``
        propagates posterior/prior means instead of samples (evaluation).
        """
        batch_size, length = next_obs.shape[:2]
        obs_t = jnp.swapaxes(next_obs, 0, 1)  # (L, B, C, H, W)
        act_t = jnp.swapaxes(action, 0, 1)  # (L, B, A)

        decode = jax.checkpoint(self._decode)

        def step(carry, inp):
            latent, belief, key = carry
            obs, act = inp
            key, k_post, k_prior = jax.random.split(key, 3)
            next_belief = self._belief(params, latent, act, belief)
            enc = self.encoder.apply(params["encoder"], obs)
            post_mean, post_std = self._posterior(params, next_belief, enc)
            prior_mean, prior_std = self._prior(params, next_belief)
            if deterministic:
                post_sample = post_mean
                prior_sample = prior_mean
            else:
                post_sample = post_mean + post_std * jax.random.normal(
                    k_post, post_mean.shape
                )
                prior_sample = prior_mean + prior_std * jax.random.normal(
                    k_prior, prior_mean.shape
                )
            recon = decode(params, post_sample, next_belief)
            reward = self._reward(params, next_belief, post_sample)[..., 0]
            out = {
                "prior_mean": prior_mean,
                "prior_std": prior_std,
                "prior_sample": prior_sample,
                "post_mean": post_mean,
                "post_std": post_std,
                "post_sample": post_sample,
                "belief": next_belief,
                "recon": recon,
                "reward": reward,
            }
            return (post_sample, next_belief, key), out

        latent0 = jnp.zeros((batch_size, self.latent_state_size))
        belief0 = jnp.zeros((batch_size, self.belief_size))
        with self._prec():
            _, outs = jax.lax.scan(step, (latent0, belief0, key), (obs_t, act_t))
        # back to batch-major
        return jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), outs)

    def loss(
        self, state: Dict[str, Any], batch: TransitionBatch, key: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """obs recon MSE (summed over CHW) + reward MSE + kl_scale * KL(q||p) with
        free-nats clamp; means over batch and time."""
        if key is None:
            key = jax.random.PRNGKey(0)
        obs_l, rew_l, kl_l = self._per_sequence_losses(
            state, batch, key, deterministic=False
        )
        obs_loss, reward_loss, kl_loss = obs_l.mean(), rew_l.mean(), kl_l.mean()
        total = obs_loss + reward_loss + self.kl_scale * kl_loss
        meta = {
            "observations_loss": obs_loss,
            "reward_loss": reward_loss,
            "kl_loss": kl_loss,
        }
        return total, meta

    def _per_sequence_losses(self, state, batch: TransitionBatch, key, deterministic):
        """Per-sequence (B,) recon / reward / free-nats-KL components."""
        params = state["params"]
        obs = self._process_pixel_obs(jnp.asarray(batch.obs))
        action = jnp.asarray(batch.act, jnp.float32)
        rewards = jnp.asarray(batch.rewards, jnp.float32)

        outs = self.unroll(
            params, obs[:, 1:], action[:, :-1], key, deterministic=deterministic
        )
        obs_l = jnp.square(outs["recon"] - obs[:, 1:]).sum(axis=(2, 3, 4)).mean(axis=1)
        rew_l = jnp.square(outs["reward"] - rewards[:, :-1]).mean(axis=1)
        # KL(N(post) || N(prior)) summed over latent dim, clamped at free nats
        p_mean, p_std = outs["prior_mean"], outs["prior_std"]
        q_mean, q_std = outs["post_mean"], outs["post_std"]
        kl = (
            jnp.log(p_std / q_std)
            + (jnp.square(q_std) + jnp.square(q_mean - p_mean)) / (2 * jnp.square(p_std))
            - 0.5
        ).sum(axis=-1)
        kl_l = jnp.maximum(kl, self.free_nats).mean(axis=1)
        return obs_l, rew_l, kl_l

    def eval_score(self, state: Dict[str, Any], batch: TransitionBatch):
        """Per-held-out-sequence validation score (1, B, 1): deterministic
        (mean-propagated) recon + reward + KL loss per window — a real score
        that tracks training, unlike round 1/2's reshaped training loss (the
        reference trains PlaNet without validation; this follows ModelTrainer's
        eval contract so `evaluate=True` is meaningful for RSSMs too)."""
        obs_l, rew_l, kl_l = self._per_sequence_losses(
            state, batch, key=jax.random.PRNGKey(0), deterministic=True
        )
        per_seq = obs_l + rew_l + self.kl_scale * kl_l
        meta = {
            "observations_loss": obs_l.mean(),
            "reward_loss": rew_l.mean(),
            "kl_loss": kl_l.mean(),
        }
        return per_seq[None, :, None], meta

    # ------------------------------------------------------------------ #
    # Acting: posterior tracking + prior sampling (ModelEnv protocol)
    # ------------------------------------------------------------------ #
    def update_posterior(
        self,
        state: Dict[str, Any],
        obs: jax.Array,
        action: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        """Condition the tracked (s, h) on a new observation (and the action that
        produced it); action None resets to zeros (episode start).

        The whole conditioning step (pixel preprocess, belief GRU, encoder,
        posterior head, sample) is ONE jitted program — it runs once per real
        env step, and eager op-by-op dispatch over a remote-device link would
        cost ~15 round trips per step."""
        if key is None:
            key = jax.random.PRNGKey(0)
        obs = jnp.asarray(obs)[None]  # (1, C, H, W), raw pixels
        if action is None:
            latent = jnp.zeros((1, self.latent_state_size))
            belief = jnp.zeros((1, self.belief_size))
            action = jnp.zeros((1, self.action_size))
        else:
            action = jnp.asarray(action, jnp.float32).reshape(1, -1)
            latent = state["posterior"]["latent"]
            belief = state["posterior"]["belief"]
        if not hasattr(self, "_jit_posterior_step"):
            self._jit_posterior_step = jax.jit(self._posterior_step_core)
        sample, next_belief = self._jit_posterior_step(
            state["params"], latent, belief, obs, action, key
        )
        return {**state, "posterior": {"latent": sample, "belief": next_belief}}

    def _posterior_step_core(self, params, latent, belief, obs, action, key):
        obs = self._process_pixel_obs(obs)
        with self._prec():
            next_belief = self._belief(params, latent, action, belief)
            enc = self.encoder.apply(params["encoder"], obs)
            post_mean, post_std = self._posterior(params, next_belief, enc)
        sample = post_mean + post_std * jax.random.normal(key, post_mean.shape)
        return sample, next_belief

    def reset_posterior(self, state: Dict[str, Any]) -> Dict[str, Any]:
        return {
            **state,
            "posterior": {
                "latent": jnp.zeros((1, self.latent_state_size)),
                "belief": jnp.zeros((1, self.belief_size)),
            },
        }

    def reset(self, state: Dict[str, Any], obs: jax.Array, key: jax.Array):
        """Tile the tracked posterior to the planner's particle batch; the obs
        values are ignored (reference planet.py:648-664)."""
        batch = obs.shape[0]
        return {
            "latent": jnp.broadcast_to(
                state["posterior"]["latent"], (batch, self.latent_state_size)
            ),
            "belief": jnp.broadcast_to(
                state["posterior"]["belief"], (batch, self.belief_size)
            ),
        }

    def sample(
        self,
        state: Dict[str, Any],
        act: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        deterministic: bool = False,
    ):
        """One prior-transition step in latent space: (s, h, a) -> (s', r', h')."""
        params = state["params"]
        with self._prec():
            next_belief = self._belief(
                params, model_state["latent"], act, model_state["belief"]
            )
            prior_mean, prior_std = self._prior(params, next_belief)
            if deterministic:
                next_latent = prior_mean
            else:
                next_latent = prior_mean + prior_std * jax.random.normal(
                    key, prior_mean.shape
                )
            reward = self._reward(params, next_belief, next_latent)
        return next_latent, reward, {"latent": next_latent, "belief": next_belief}

    def render(self, state: Dict[str, Any], latent: jax.Array, belief: jax.Array) -> np.ndarray:
        """Decode latents to uint8 images (for visualization)."""
        pred = self._decode(state["params"], latent, belief)
        img = 255.0 * jnp.clip(pred + 0.5, 0.0, 1.0)
        return np.asarray(img).transpose(0, 2, 3, 1).astype(np.uint8)

    # ------------------------------------------------------------------ #
    def update_normalizer(self, state, batch):
        return state

    def set_elite(self, state, elite):
        return state

    def save(self, state: Dict[str, Any], save_dir) -> None:
        host = jax.device_get(state["params"])
        with open(pathlib.Path(save_dir) / _PARAMS_FNAME, "wb") as f:
            pickle.dump(host, f)

    def load(self, state: Dict[str, Any], load_dir) -> Dict[str, Any]:
        with open(pathlib.Path(load_dir) / _PARAMS_FNAME, "rb") as f:
            params = pickle.load(f)
        return {**state, "params": jax.tree_util.tree_map(jnp.asarray, params)}
