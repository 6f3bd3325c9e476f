"""Sharded on-device rollout + policy-gradient training step.

One jitted program does everything: T env steps (vmap'd auto-resetting
transition + obs encode), advantage estimation, actor-critic loss, and the
optimizer update. The env batch is sharded over the mesh's 'env' axis;
parameters are replicated over 'env' and (optionally) sharded over 'model'.
Gradients are averaged across shards by XLA-inserted collectives — the
GSPMD equivalent of the NCCL all-reduce the reference never had.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigrid_tpu.core.autoreset import make_autoreset_step
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.base import Env
from minigrid_tpu.models.policy import ActorCritic
from minigrid_tpu.parallel.sharding import ENV_AXIS, env_sharding, replicated


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_model(env: Env) -> ActorCritic:
    return ActorCritic(num_actions=env.num_actions)


def make_optimizer(lr: float = 3e-4) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))


def init_train_state(key: jax.Array, env: Env, mesh: Mesh) -> TrainState:
    model = make_model(env)
    v = env.config.agent_view_size
    dummy = jnp.zeros((1, v, v, 3), dtype=jnp.uint8)
    params = model.init(key, dummy)
    opt_state = make_optimizer().init(params)
    rep = replicated(mesh)
    return TrainState(
        params=jax.tree.map(lambda x: jax.device_put(x, rep), params),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, opt_state
        ),
    )


def build_train_step(
    env: Env,
    mesh: Mesh,
    num_steps: int,
    gamma: float = 0.99,
    entropy_coef: float = 0.01,
    value_coef: float = 0.5,
):
    """Returns jitted `train_step(train_state, states, key) ->
    (train_state, states, metrics)` with mesh-aware shardings."""
    model = make_model(env)
    optimizer = make_optimizer()
    auto_step = jax.vmap(make_autoreset_step(env))
    batched_obs = jax.vmap(lambda s: gen_obs_image(s, env.config))

    def rollout(params, states: EnvState, key: jax.Array):
        def body(carry, key_t):
            # Pre-action obs rides the carry from the previous auto-reset
            # step, so the encoder runs once per step (not twice).
            states, obs = carry
            logits, value = model.apply(params, obs)
            actions = jax.random.categorical(key_t, logits)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(actions.shape[0]), actions
            ]
            states, next_obs, reward, term, trunc = auto_step(
                states, actions.astype(jnp.int32)
            )
            done = term | trunc
            return (states, next_obs["image"]), (
                obs,
                actions,
                logp,
                value,
                reward,
                done,
            )

        keys = jax.random.split(key, num_steps)
        (states, _), traj = lax.scan(body, (states, batched_obs(states)), keys)
        return states, traj

    def loss_fn(params, states, key):
        states, (obs, actions, logp_b, value, reward, done) = rollout(
            params, states, key
        )
        # Discounted returns computed backward over the scan axis (T, B).
        not_done = 1.0 - done.astype(jnp.float32)

        def disc(carry, xs):
            r, nd = xs
            ret = r + gamma * nd * carry
            return ret, ret

        _, returns = lax.scan(
            disc, jnp.zeros_like(reward[0]), (reward, not_done), reverse=True
        )
        adv = returns - value
        logits, value_now = model.apply(params, obs)  # re-eval for grads
        logp_all = jax.nn.log_softmax(logits)
        T, B = actions.shape
        logp = jnp.take_along_axis(logp_all, actions[..., None], axis=-1)[..., 0]
        entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

        pg_loss = -jnp.mean(logp * lax.stop_gradient(adv))
        v_loss = jnp.mean((value_now - lax.stop_gradient(returns)) ** 2)
        ent = jnp.mean(entropy)
        loss = pg_loss + value_coef * v_loss - entropy_coef * ent
        metrics = {
            "loss": loss,
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": ent,
            "reward_per_step": jnp.mean(reward),
            "episodes": jnp.sum(done.astype(jnp.float32)),
        }
        return loss, (states, metrics)

    def train_step(train_state: TrainState, states: EnvState, key: jax.Array):
        grads, (states, metrics) = jax.grad(loss_fn, has_aux=True)(
            train_state.params, states, key
        )
        updates, opt_state = optimizer.update(
            grads, train_state.opt_state, train_state.params
        )
        params = optax.apply_updates(train_state.params, updates)
        return TrainState(params, opt_state), states, metrics

    shard_env = env_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, shard_env, rep),
        out_shardings=(rep, shard_env, rep),
    )
