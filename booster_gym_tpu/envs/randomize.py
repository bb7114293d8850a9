"""Declarative randomization, JAX version of the reference's
apply_randomization (reference: utils/utils.py:5-30).

A randomization spec is a dict {range, operation, distribution} read straight
from config (the reference interprets the same triples); a None spec is a
no-op, which is how absent config keys disable a term
(reference: envs/t1.py:81-83 uses cfg.get(...) -> None).

Semantics preserved exactly:
  * gaussian: range = [mu, sigma]; noise_val = mu + sigma * N(0,1)
  * uniform:  range = [lo, hi];    noise_val = lo + (hi - lo) * U(0,1)
  * additive: x + noise_val;  scaling: x * noise_val
  * return_noise returns the *unit* noise (N(0,1) / U(0,1) sample), which is
    what the reference stores into base_mass_scaled for privileged obs
    (reference: envs/t1.py:142-153).
"""

import jax
import jax.numpy as jnp


def apply_randomization(key, tensor, params, return_noise=False):
    if params is None:
        if return_noise:
            return tensor, jnp.zeros_like(tensor)
        return tensor

    dist = params["distribution"]
    a, b = params["range"]
    if dist == "gaussian":
        noise = jax.random.normal(key, jnp.shape(tensor))
        noise_val = a + b * noise
    elif dist == "uniform":
        noise = jax.random.uniform(key, jnp.shape(tensor))
        noise_val = a + (b - a) * noise
    else:
        raise ValueError(f"Invalid randomization distribution: {dist}")

    op = params["operation"]
    if op == "additive":
        result = tensor + noise_val
    elif op == "scaling":
        result = tensor * noise_val
    else:
        raise ValueError(f"Invalid randomization operation: {op}")

    if return_noise:
        return result, noise
    return result
