"""Actor-critic networks (flax linen).

Same architecture as the reference model (reference: utils/model.py:7-36):
actor MLP 256-128-128 -> num_act with ELU and a state-independent learned
logstd initialized to -2.0; asymmetric critic 256-256-128 -> 1 on
[obs ‖ privileged_obs].  Initialization reproduces torch.nn.Linear defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so learning
dynamics are comparable.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_linear_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class MLP(nn.Module):
    features: tuple
    out_dim: int
    # computation dtype for the dense layers.  The PPO update (20 full-batch
    # mini-epochs over horizon x num_envs activations) is HBM-bandwidth
    # bound; bf16 activations halve that traffic and use single-pass MXU
    # matmuls.  Params and optimizer state stay f32 (param_dtype below);
    # f32 inputs are equivalent to the reference's A100 TF32 matmuls at
    # triple-pass (HIGH) precision.
    compute_dtype: str = "bf16"

    @nn.compact
    def __call__(self, x):
        bf16 = self.compute_dtype == "bf16"
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        precision = None if bf16 else jax.lax.Precision.HIGH
        for f in self.features:
            x = nn.Dense(
                f, kernel_init=_torch_linear_init,
                bias_init=_torch_bias_init(x.shape[-1]), precision=precision,
                dtype=dtype, param_dtype=jnp.float32)(x)
            x = nn.elu(x)
        out = nn.Dense(
            self.out_dim, kernel_init=_torch_linear_init,
            bias_init=_torch_bias_init(x.shape[-1]), precision=precision,
            dtype=dtype, param_dtype=jnp.float32)(x)
        return out.astype(jnp.float32)


class ActorCritic(nn.Module):
    num_act: int
    num_obs: int
    num_privileged_obs: int
    compute_dtype: str = "bf16"   # see MLP.compute_dtype
    # reference init is -2.0 (utils/model.py:14); exploration-hungry tasks
    # (standup: +-5 action range from sparse-ish success) override it
    init_logstd: float = -2.0

    def setup(self):
        self.actor = MLP((256, 128, 128), self.num_act, self.compute_dtype)
        self.critic = MLP((256, 256, 128), 1, self.compute_dtype)
        init = self.init_logstd
        self.logstd = self.param(
            "logstd", lambda key, shape: jnp.full(shape, init),
            (1, self.num_act))

    def __call__(self, obs, privileged_obs):
        """Used only for parameter init."""
        mu, std = self.act(obs)
        value = self.est_value(obs, privileged_obs)
        return mu, std, value

    def act(self, obs):
        """Action distribution (mu, std) — reference utils/model.py:29-32."""
        mu = self.actor(obs)
        std = jnp.broadcast_to(jnp.exp(self.logstd), mu.shape)
        return mu, std

    def est_value(self, obs, privileged_obs):
        """Asymmetric critic on concat(obs, privileged) —
        reference utils/model.py:34-36."""
        x = jnp.concatenate([obs, privileged_obs], axis=-1)
        return self.critic(x)[..., 0]


def normal_log_prob(mu, std, x):
    """Sum over action dims of the diagonal-normal log pdf (the reference
    sums torch Normal.log_prob over dim -1, utils/runner.py:125)."""
    var = std * std
    lp = -0.5 * jnp.square(x - mu) / var - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi)
    return jnp.sum(lp, axis=-1)


def normal_entropy(std):
    """Per-dim entropy summed over action dims (utils/runner.py:157)."""
    return jnp.sum(0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std), axis=-1)


def normal_kl(mu_old, std_old, mu_new, std_new):
    """Analytic KL(old ‖ new) summed over dims, matching the reference's
    adaptive-LR statistic (utils/runner.py:168-173)."""
    return jnp.sum(
        jnp.log(std_new / std_old)
        + 0.5 * (jnp.square(std_old) + jnp.square(mu_new - mu_old)) / jnp.square(std_new)
        - 0.5,
        axis=-1,
    )
