"""PPO trainer: one jitted train iteration = rollout + update.

Re-design of the reference Runner loop (reference: utils/runner.py:99-215)
as a single XLA program: the 24-step rollout is a lax.scan over the pure env
step, the 20 full-batch mini-epochs are a lax.scan over the update, GAE is a
reverse lax.scan (recurrence of utils/utils.py:33-44), and episode
statistics accumulate on device (replacing the host-side Recorder loop,
utils/recorder.py:36-62).  Only a small dict of scalars leaves the device
each iteration.

Numerics matched to the reference:
  * timeout rewards bootstrapped with the *current* value estimate each
    mini-epoch (utils/runner.py:135);
  * values recomputed (with gradient) every mini-epoch; GAE/returns under
    stop_gradient (utils/runner.py:131-145 no_grad block);
  * advantage normalization with Bessel-corrected std (torch .std());
  * clipped surrogate with e_clip = 0.2 (utils/utils.py:47-52);
  * bound loss on the raw action mean at +-1 (utils/runner.py:152);
  * entropy bonus via entropy_coef = -0.01 added to the loss;
  * analytic-KL adaptive LR x/÷1.5 clamped to [1e-5, 1e-2], applied after
    each mini-epoch's optimizer step (utils/runner.py:167-180);
  * global grad-norm clip 1.0 and Adam (utils/runner.py:164).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from flax import struct

from booster_gym_tpu.algo.networks import (
    ActorCritic,
    normal_entropy,
    normal_kl,
    normal_log_prob,
)


def discount_values(rewards, dones, values, last_values, gamma, lam):
    """GAE advantages — reverse scan with the recurrence of the reference's
    discount_values (utils/utils.py:33-44)."""
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)

    def body(last_adv, x):
        rew, done, val, next_val = x
        nonterminal = 1.0 - done.astype(jnp.float32)
        delta = rew + gamma * nonterminal * next_val - val
        adv = delta + gamma * lam * nonterminal * last_adv
        return adv, adv

    _, advantages = jax.lax.scan(
        body, jnp.zeros_like(last_values), (rewards, dones, values, next_values),
        reverse=True,
    )
    return advantages


class TrainState(struct.PyTreeNode):
    params: any
    opt_state: any
    lr: jnp.ndarray
    env_state: any
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    key: jnp.ndarray
    # on-device episode statistics (recorder semantics, utils/recorder.py:36-62)
    episode_sums: dict
    episode_steps: jnp.ndarray
    iteration: jnp.ndarray


class PPO:
    def __init__(self, env, cfg):
        self.env = env
        self.cfg = cfg
        acfg = cfg["algorithm"]
        self.gamma = acfg["gamma"]
        self.lam = acfg["lam"]
        self.clip_ratio = acfg.get("clip_ratio", 0.2)
        self.bound_coef = acfg["bound_coef"]
        self.entropy_coef = acfg["entropy_coef"]
        self.desired_kl = acfg["desired_kl"]
        self.base_lr = acfg["learning_rate"]
        self.horizon = cfg["runner"]["horizon_length"]
        self.mini_epochs = cfg["runner"]["mini_epochs"]
        self.compute_dtype = acfg.get("compute_dtype", "bf16")
        # "fused": mini-epoch gradients through the Pallas update kernel
        # (activations stay in VMEM — see algo/update_kernel.py); "xla":
        # plain jax.grad of the loss.  Numerics match to bf16 rounding
        # (tests/test_update_kernel.py).
        self.update_backend = acfg.get("update_backend", "fused")
        # exploration floor for sparse/discovery tasks (standup): clamp
        # the learned logstd after each optimizer step.  The walk tasks
        # leave it unset (reference has no such clamp).  PPO's entropy
        # collapse at converged sigma is what ends get-up discovery —
        # round-5 standup scalars: entropy -24 by iteration 5k, success
        # plateaus right after.
        self.min_logstd = acfg.get("min_logstd")
        # tile sweep on v5e at 4096 envs x 24 horizon: 1024 -> 36 ms,
        # 2048 -> 33.2 ms, 4096 -> 32.5 ms, 8192 -> VMEM OOM
        self.update_tile = acfg.get("update_tile", 4096)
        # unroll factor of the mini-epoch scan: >1 lets XLA overlap the
        # small inter-epoch carry copies (logstd/bias SMEM staging) across
        # epochs; semantics identical (the params dependency chain is
        # preserved, only loop structure changes)
        self.update_scan_unroll = acfg.get("update_scan_unroll", 1)
        self.mesh = None
        self.axis_name = "dp"
        self.network = ActorCritic(
            env.num_actions, env.num_obs, env.num_privileged_obs,
            compute_dtype=self.compute_dtype,
            init_logstd=acfg.get("init_logstd", -2.0))
        # single source of truth for the optimizer hyperparameters: both
        # self.tx and the flat-vector step below are built from these
        # (the reference uses torch Adam defaults, utils/runner.py:33)
        self.grad_norm_clip = acfg.get("grad_norm_clip", 1.0)
        self.adam_b1, self.adam_b2, self.adam_eps = 0.9, 0.999, 1e-8
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.grad_norm_clip),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=self.base_lr, b1=self.adam_b1,
                b2=self.adam_b2, eps=self.adam_eps),
        )

    def set_mesh(self, mesh, axis_name="dp"):
        """Run the fused update kernels per-device under shard_map over
        `axis_name` (pallas_call is not GSPMD-partitionable; the gradient
        psum happens inside — see update_kernel.FusedUpdate)."""
        self.mesh = mesh
        self.axis_name = axis_name

    def _flat_adam(self, g, p, m, v, cnt, lr):
        """clip_by_global_norm + Adam on raveled [n_params] vectors — the
        shared core of _flat_optimizer_step and the fused epoch scan's
        flat carry.  Replicates optax's exact update formulas (clip:
        optax/_src/clipping.py; adam: optax/_src/transform.py
        scale_by_adam; safe_increment: optax numerics) using the SAME
        hyperparameter attributes self.tx is built from — pinned
        tree-exactly against self.tx.update by tests/test_ppo.py."""
        b1, b2, eps = self.adam_b1, self.adam_b2, self.adam_eps
        g_norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        g = jnp.where(g_norm < self.grad_norm_clip, g,
                      (g / g_norm) * self.grad_norm_clip)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        # numerics.safe_increment
        cmax = jnp.iinfo(jnp.int32).max
        cnt = jnp.where(cnt < cmax, cnt + 1, cnt)
        m_hat = m / (1.0 - b1 ** cnt).astype(m.dtype)
        v_hat = v / (1.0 - b2 ** cnt).astype(v.dtype)
        p2 = p + (-lr) * (m_hat / (jnp.sqrt(v_hat) + eps))
        return p2, m, v, cnt

    def _flat_optimizer_step(self, grads, params, opt_state, lr):
        """optax.chain(clip_by_global_norm(c), inject_hyperparams(adam)(lr))
        computed on ONE raveled vector instead of ~20 small leaves.

        The per-leaf formulation costs ~80 scalar-shaped VPU ops per
        mini-epoch (~150 us, 3 ms/iteration at 20 epochs); raveled, XLA
        fuses the whole optimizer into a couple of passes over a [190k]
        vector.  The hot path (fused epoch scan) keeps p/m/v raveled in
        the scan carry and calls _flat_adam directly; this tree-in/tree-out
        wrapper serves the standalone callers and the optax-parity test."""
        import jax.flatten_util as jfu

        clip_state, inj = opt_state
        adam_state, sb_lr_state = inj.inner_state

        g, unravel = jfu.ravel_pytree(grads)
        m, _ = jfu.ravel_pytree(adam_state.mu)
        v, _ = jfu.ravel_pytree(adam_state.nu)
        p, unravel_p = jfu.ravel_pytree(params)
        p2, m, v, cnt = self._flat_adam(g, p, m, v, adam_state.count, lr)
        params2 = unravel_p(p2)
        cmax = jnp.iinfo(jnp.int32).max
        inj_cnt = jnp.where(inj.count < cmax, inj.count + 1, inj.count)
        opt_state2 = (clip_state, inj._replace(
            count=inj_cnt,
            hyperparams={**inj.hyperparams, "learning_rate": lr},
            inner_state=(adam_state._replace(count=cnt, mu=unravel(m),
                                             nu=unravel(v)), sb_lr_state)))
        return params2, opt_state2

    def _fused_update(self):
        from booster_gym_tpu.algo.update_kernel import FusedUpdate

        return FusedUpdate(
            self.env.num_obs, self.env.num_privileged_obs,
            self.env.num_actions, clip_ratio=self.clip_ratio,
            bound_coef=self.bound_coef, compute_dtype=self.compute_dtype,
            tile=self.update_tile,
            interpret=jax.default_backend() != "tpu",
            mesh=self.mesh, axis_name=self.axis_name)

    # -- param/state init ------------------------------------------------
    def init(self, key):
        k_params, k_env, k_reset, k_carry = jax.random.split(key, 4)
        env_params = self.env.init_params(k_env)
        env_state, obs, info = self.env.reset_all(env_params, k_reset)
        params = self.network.init(
            k_params, jnp.zeros((1, self.env.num_obs)),
            jnp.zeros((1, self.env.num_privileged_obs)))
        opt_state = self.tx.init(params)
        B = self.env.num_envs
        episode_sums = {"reward": jnp.zeros(B)}
        for name in self.env.reward_scales:
            episode_sums[name] = jnp.zeros(B)
        ts = TrainState(
            params=params, opt_state=opt_state,
            lr=jnp.asarray(self.base_lr, jnp.float32),
            env_state=env_state, obs=obs, privileged_obs=info["privileged_obs"],
            key=k_carry, episode_sums=episode_sums,
            episode_steps=jnp.zeros(B, jnp.int32),
            iteration=jnp.asarray(0, jnp.int32),
        )
        return env_params, ts

    # -- policy inference ------------------------------------------------
    def act(self, params, obs):
        return self.network.apply(params, obs, method=ActorCritic.act)

    def est_value(self, params, obs, privileged_obs):
        return self.network.apply(
            params, obs, privileged_obs, method=ActorCritic.est_value)

    # -- one training iteration -----------------------------------------
    def rollout(self, env_params, ts):
        """Horizon scan + on-device episode statistics
        (utils/runner.py:106-121).  Returns (carry, buffers); exposed
        separately from update() so bench.py can attribute per-phase time."""
        def rollout_step(carry, _):
            env_state, obs, priv, key, ep_sums, ep_steps, fin_sums, fin_cnt, fin_steps = carry
            key, k_act = jax.random.split(key)
            mu, std = self.act(ts.params, obs)
            act = mu + std * jax.random.normal(k_act, mu.shape)
            env_state, obs2, rew, done, info = self.env.step(env_params, env_state, act)

            # on-device episode statistics
            d = done.astype(jnp.float32)
            ep_steps = ep_steps + 1
            new_sums = {}
            for name, val in {"reward": rew, **info["rew_terms"]}.items():
                s = ep_sums[name] + val
                fin_sums[name] = fin_sums[name] + jnp.sum(s * d)
                # where(), not s*(1-d): a non-finite episode sum must not
                # survive its env's reset (NaN * 0 == NaN)
                new_sums[name] = jnp.where(done, 0.0, s)
            fin_cnt = fin_cnt + jnp.sum(d)
            fin_steps = fin_steps + jnp.sum(ep_steps * done)
            ep_steps = ep_steps * (1 - done)

            out = (obs, priv, act, mu, std, rew, done, info["time_outs"])
            return (env_state, obs2, info["privileged_obs"], key, new_sums,
                    ep_steps, fin_sums, fin_cnt, fin_steps), out

        fin_sums0 = {k: jnp.zeros(()) for k in ts.episode_sums}
        carry0 = (ts.env_state, ts.obs, ts.privileged_obs, ts.key, ts.episode_sums,
                  ts.episode_steps, fin_sums0, jnp.zeros(()), jnp.zeros(()))
        return jax.lax.scan(rollout_step, carry0, None, length=self.horizon)

    def update(self, ts, carry, buf):
        """The 20 full-batch mini-epochs on a rollout's buffers
        (utils/runner.py:131-185).  Returns ((params, opt_state, lr),
        per-epoch stat arrays)."""
        (env_state, obs_last, priv_last, key, ep_sums, ep_steps,
         fin_sums, fin_cnt, fin_steps) = carry
        (obs_buf, priv_buf, act_buf, mu_buf, std_buf, rew_buf, done_buf, timeout_buf) = buf

        old_logp = normal_log_prob(mu_buf, std_buf, act_buf)

        # ---- update (utils/runner.py:131-185)
        # iteration-invariant update inputs, built ONCE outside the
        # mini-epoch scan: {0,1} floats for the GAE kernel's exact
        # where()-equivalent selects, and the batch-on-lanes transposes
        # of the rollout buffers for the gradient kernel
        T, B = rew_buf.shape
        N = T * B
        nonterm = 1.0 - (done_buf | timeout_buf).astype(jnp.float32)
        timeout_f = timeout_buf.astype(jnp.float32)
        fused_once = (self._fused_update()
                      if self.update_backend == "fused" else None)
        prep = (fused_once.prepare(obs_buf, priv_buf, act_buf, mu_buf,
                                   old_logp, obs_last=obs_last,
                                   priv_last=priv_last)
                if fused_once is not None else None)
        std_old = std_buf[0, 0]                         # state-independent

        def epoch_fused(carry, muoldT_c, old_logp_c, self_old):
            """Mini-epoch through the fused Pallas kernels (round 5
            layout), THREE kernels and a handful of scalar XLA ops:
              1. gae: reverse walk over horizon+1 steps — critic values
                 incl. the bootstrap value at the last obs, timeout
                 bootstrap, GAE, advantage sums;
              2. grads_stats: actor+critic forward/backward with
                 in-kernel advantage normalization and the reference
                 metric sums, gradients returned as raw leaves;
              3. opt_stage: clip-by-global-norm + Adam over the leaves
                 plus the compute-dtype weight staging (cast+transpose)
                 for the NEXT epoch's kernels.
            params/Adam moments ride the scan carry as leaf lists in the
            gradient kernel's orientation; no pytree/ravel churn inside
            the scan.  Numerics identical to the `epoch` branch below
            (tests compare them)."""
            p_lv, m_lv, v_lv, stg, cnt, lr, _lr_used = carry
            fused = fused_once
            adv_raw, returns, s_a, s_a2 = fused.gae_prepared_staged(
                stg, prep["obscG"], rew_buf, nonterm, timeout_f,
                self.gamma, self.lam)
            # Bessel-corrected normalization stats (torch .std()); the
            # normalize itself happens inside the gradient kernel.  The
            # one-pass formula (s_a2 - N*mean^2) is cancellation-prone
            # when |mean| >> std — PPO advantages are near-zero-mean by
            # construction (GAE residuals), so the f32 error stays ~ulp;
            # the max() guards the residual negative-zero case.  If
            # normalization drift is ever suspected, the XLA twin
            # (update_backend: xla) computes the two-pass std for A/B.
            mean = s_a / N
            var = (s_a2 - N * mean * mean) / (N - 1)
            rstd = 1.0 / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-8)
            # the update's "old policy" is the gradient kernel's OWN
            # epoch-0 forward, captured by the caller (epoch 0 runs peeled
            # out of the scan) and closed over for epochs 1+: any
            # separately compiled forward (flax rollout, a dedicated
            # pre-pass) can disagree by bf16 rounding, which dominates
            # importance ratios and the KL estimate once the learned sigma
            # is small (observed: kl 7.2 vs 0.15 on standup; reward@5k
            # 54.6 vs 66.7 on T1 flat from the same mechanism via the LR
            # path)
            g_lv, st, mu_out, logp_out = fused.grads_stats_prepared_staged(
                stg, {**prep, "muoldT": muoldT_c,
                      "old_logp": old_logp_c},
                adv_raw, returns, mean, rstd, self_old=self_old,
                raw_leaves=True)

            # finish the reference metric formulas from the kernel sums
            logstd = p_lv[-1][:, 0]                     # [num_act]
            std = jnp.exp(logstd)
            na = std.shape[0]
            value_loss = st["vl"] / N
            actor_loss = st["al"] / N
            bound_loss = st["bhi"] / (N * na) + st["blo"] / (N * na)
            entropy = jnp.sum(0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + logstd)
            # analytic KL vs the rollout policy (utils/runner.py:168-173):
            # per-dim constants + the kernel's sum of (mu_new - mu_old)^2
            kl_const = jnp.sum(
                jnp.log(std / std_old)
                + 0.5 * jnp.square(std_old) / jnp.square(std) - 0.5)
            kl_mean = kl_const + 0.5 * jnp.sum(
                st["klsq"] / (N * jnp.square(std)))

            # entropy-bonus gradient added in-kernel, before the clip
            p2, m2, v2, stg2 = fused.opt_stage(
                g_lv, p_lv, m_lv, v_lv, cnt, lr,
                entropy_coef=self.entropy_coef, b1=self.adam_b1,
                b2=self.adam_b2, eps=self.adam_eps,
                max_norm=self.grad_norm_clip)
            if self.min_logstd is not None:
                p2[-1] = jnp.maximum(p2[-1], self.min_logstd)
                # the staged dict's logstd feeds the NEXT epoch's gradient
                # kernel — it must be the clamped leaf, not the kernel's
                # raw output
                stg2 = {**stg2, "logstd": p2[-1]}
            cmax = jnp.iinfo(jnp.int32).max
            cnt2 = jnp.where(cnt < cmax, cnt + 1, cnt)

            lr2 = jnp.where(
                kl_mean > self.desired_kl * 2.0, jnp.maximum(1e-5, lr / 1.5),
                jnp.where(kl_mean < self.desired_kl / 2.0,
                          jnp.minimum(1e-2, lr * 1.5), lr))
            return (p2, m2, v2, stg2, cnt2, lr2, lr), (
                value_loss, actor_loss, bound_loss, entropy,
                kl_mean), mu_out, logp_out

        def epoch(carry, _):
            params, opt_state, lr = carry

            def loss_fn(p):
                mu, std = self.act(p, obs_buf)
                values = self.est_value(p, obs_buf, priv_buf)
                last_values = self.est_value(p, obs_last, priv_last)
                vd = jax.lax.stop_gradient(values)
                lvd = jax.lax.stop_gradient(last_values)
                rwd = jnp.where(timeout_buf, vd, rew_buf)
                adv = discount_values(
                    rwd, done_buf | timeout_buf, vd, lvd, self.gamma, self.lam)
                returns = vd + adv
                adv = (adv - adv.mean()) / (jnp.std(adv, ddof=1) + 1e-8)

                value_loss = jnp.mean(jnp.square(values - returns))
                logp = normal_log_prob(mu, std, act_buf)
                ratio = jnp.exp(logp - old_logp)
                surr = -adv * ratio
                surr_clipped = -adv * jnp.clip(
                    ratio, 1.0 - self.clip_ratio, 1.0 + self.clip_ratio)
                actor_loss = jnp.mean(jnp.maximum(surr, surr_clipped))
                bound_loss = (
                    jnp.mean(jnp.square(jnp.clip(mu - 1.0, min=0.0)))
                    + jnp.mean(jnp.square(jnp.clip(mu + 1.0, max=0.0))))
                entropy = jnp.mean(normal_entropy(std))
                loss = (value_loss + actor_loss + self.bound_coef * bound_loss
                        + self.entropy_coef * entropy)
                return loss, (value_loss, actor_loss, bound_loss, entropy, mu, std)

            grads, aux = jax.grad(loss_fn, has_aux=True)(params)
            value_loss, actor_loss, bound_loss, entropy, mu, std = aux
            inject = opt_state[1]._replace(
                hyperparams={**opt_state[1].hyperparams, "learning_rate": lr})
            updates, opt_state2 = self.tx.update(grads, (opt_state[0], inject), params)
            params2 = optax.apply_updates(params, updates)
            if self.min_logstd is not None:
                params2["params"]["logstd"] = jnp.maximum(
                    params2["params"]["logstd"], self.min_logstd)

            kl_mean = jnp.mean(normal_kl(mu_buf, std_buf, mu, std))
            lr2 = jnp.where(
                kl_mean > self.desired_kl * 2.0, jnp.maximum(1e-5, lr / 1.5),
                jnp.where(kl_mean < self.desired_kl / 2.0, jnp.minimum(1e-2, lr * 1.5), lr))
            return (params2, opt_state2, lr2), (
                value_loss, actor_loss, bound_loss, entropy, kl_mean)

        if self.update_backend == "fused":
            clip_state, inj = ts.opt_state
            adam_state, sb_lr_state = inj.inner_state
            p_lv = fused_once.param_leaves(ts.params)
            m_lv = fused_once.param_leaves(adam_state.mu)
            v_lv = fused_once.param_leaves(adam_state.nu)
            staged0 = fused_once.stage_leaves(p_lv)

            # epoch 0 runs PEELED out of the scan: its kernel forward
            # becomes the old policy for epochs 1+ as closed-over
            # constants, so the scan carry drops the [num_act, T*B] mu
            # plane and the per-epoch where() copies entirely
            carry = (p_lv, m_lv, v_lv, staged0, adam_state.count,
                     ts.lr, ts.lr)
            carry, stats0, mu_old0, old_logp0 = epoch_fused(
                carry, prep["muoldT"], prep["old_logp"], self_old=1.0)

            def scan_body(c, _):
                c2, stats, _, _ = epoch_fused(c, mu_old0, old_logp0,
                                              self_old=0.0)
                return c2, stats

            carry, stats_rest = jax.lax.scan(
                scan_body, carry, None, length=self.mini_epochs - 1,
                unroll=self.update_scan_unroll)
            p_lv, m_lv, v_lv, _stg, cnt, lr2, lr_used = carry
            stats = jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                stats0, stats_rest)

            # re-tree the leaf carry once (mirrors _flat_optimizer_step's
            # state bookkeeping; inject count tracks the adam count — both
            # increment once per mini-epoch from equal initial values)
            opt_state2 = (clip_state, inj._replace(
                count=cnt,
                hyperparams={**inj.hyperparams, "learning_rate": lr_used},
                inner_state=(adam_state._replace(
                    count=cnt, mu=fused_once.leaves_to_tree(m_lv),
                    nu=fused_once.leaves_to_tree(v_lv)),
                    sb_lr_state)))
            return (fused_once.leaves_to_tree(p_lv), opt_state2, lr2), stats
        return jax.lax.scan(
            epoch, (ts.params, ts.opt_state, ts.lr), None,
            length=self.mini_epochs, unroll=self.update_scan_unroll)

    def train_iterations(self, env_params, ts, n):
        """n train iterations in ONE device program (lax.scan over
        train_iteration; `n` static).  Measured on v5e at 4096 envs:
        SLOWER than per-iteration dispatch (48.1 vs 46.8 ms/iter — the
        scan carry copies the un-donatable TrainState between iterations,
        costing more than the ~1.3 ms host-dispatch gap it saves), so the
        runner and bench dispatch per iteration; kept for the measurement
        tools and for future multi-host use where dispatch gaps grow.
        Metrics come back stacked [n]."""
        def body(ts, _):
            return self.train_iteration(env_params, ts)

        return jax.lax.scan(body, ts, None, length=n)

    def train_iteration(self, env_params, ts):
        """(env_params, TrainState) -> (TrainState, metrics dict of
        scalars) — rollout + update (reference loop utils/runner.py:99-215)."""
        carry, buf = self.rollout(env_params, ts)
        (env_state, obs_last, priv_last, key, ep_sums, ep_steps,
         fin_sums, fin_cnt, fin_steps) = carry
        (params, opt_state, lr), stats = self.update(ts, carry, buf)
        value_loss, actor_loss, bound_loss, entropy, kl_mean = stats

        levels = env_state.env_curriculum_level
        metrics = {
            "reward": fin_sums["reward"] / jnp.maximum(fin_cnt, 1.0),
            "steps": fin_steps / jnp.maximum(fin_cnt, 1.0),
            "episodes": fin_cnt,
            "value_loss": value_loss.mean(),
            "actor_loss": actor_loss.mean(),
            "bound_loss": bound_loss.mean(),
            "entropy": entropy.mean(),
            "kl_mean": kl_mean[-1],
            "lr": lr,
            "curriculum/mean_lin_vel_level": jnp.mean(jnp.abs(levels[:, 0]).astype(jnp.float32)),
            "curriculum/mean_ang_vel_level": jnp.mean(jnp.abs(levels[:, 1]).astype(jnp.float32)),
            "curriculum/max_lin_vel_level": jnp.max(jnp.abs(levels[:, 0])).astype(jnp.float32),
            "curriculum/max_ang_vel_level": jnp.max(jnp.abs(levels[:, 1])).astype(jnp.float32),
        }
        for name in self.env.reward_scales:
            metrics[f"episode/{name}"] = fin_sums[name] / jnp.maximum(fin_cnt, 1.0)

        ts = ts.replace(
            params=params, opt_state=opt_state, lr=lr,
            env_state=env_state, obs=obs_last, privileged_obs=priv_last, key=key,
            episode_sums=ep_sums, episode_steps=ep_steps,
            iteration=ts.iteration + 1,
        )
        return ts, metrics
