"""T1 humanoid locomotion task, pure-functional JAX.

Re-design of the reference task (reference: envs/t1.py, 730 lines) as a pure
step function  (params, state, actions) -> (state', obs, rew, done, info)
so the whole rollout lives inside one jitted lax.scan, sharded over the env
axis.  Heterogeneous per-env resets/resamples become masked batched updates
(the reference uses indexed tensor writes, envs/t1.py:323-341).

Semantics faithfully reproduced (see the per-method citations):
  * PD + per-env action-delay latching + Coulomb joint friction control
    inner loop at decimation=10 (envs/t1.py:437-457)
  * velocity kicks / force-torque pushes (envs/t1.py:499-527)
  * termination + timeout flags (envs/t1.py:551-558)
  * the full 25-term reward registry (envs/t1.py:606-730)
  * grid curriculum with neighbor diffusion (envs/t1.py:391-435)
  * 47-dim actor obs / 14-dim privileged obs (envs/t1.py:574-603)

Documented divergences from the reference (the curriculum-transpose and
Bernoulli-still items were A/B'd on-chip at 1k iterations x 3 seeds —
reward-neutral within variance; the reference-exact still mode costs +3.0%
throughput, hence not the default.  Numbers in IMPLEMENTATION_NOTES.md,
raw curves in benchmarks/ab_divergence.jsonl (1 seed, round 3) and
benchmarks/ab_divergence_r4.jsonl (3 seeds); reference-exact toggles
`still_mode` / `curriculum_transpose_quirk` in the commands config):
  * extras["time_outs"] always reflects the current step (the reference
    leaves it stale when no env resets, envs/t1.py:317);
  * curriculum sampling maps flat index -> (lin, ang) without the axis swap
    at envs/t1.py:417-418 (a transpose quirk that is only consistent for
    square grids);
  * still-command selection is per-env Bernoulli(still_proportion) instead
    of an exact fraction of a permutation (envs/t1.py:381);
  * pushes are applied on the first physics substep of each control step,
    which is when PhysX actually applies the once-per-step force tensor the
    reference submits (envs/t1.py:522-527);
  * on trimesh terrain the Pallas path holds each contact point's terrain
    height/normal fixed across the 10 substeps of a control step (exact
    values for ALL points, one fused gather per step; sub-mm staleness at
    walking speeds).  Envs that just reset or teleported use the height
    under their new root until their first step completes.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from booster_gym_tpu.envs.randomize import apply_randomization
from booster_gym_tpu.envs.state import EnvParams, EnvState
from booster_gym_tpu.math.quat import (
    euler_xyz_from_quat,
    quat_from_euler_xyz,
    quat_rotate,
    quat_rotate_inverse,
)
from booster_gym_tpu.model import load_urdf
from booster_gym_tpu.physics import DynParams, SimConfig, SimState
from booster_gym_tpu.physics.engine import make_fk, make_substep
from booster_gym_tpu.terrain import Terrain

_REFERENCE_ROOT = "/root/reference"


def _resolve_asset(path):
    if os.path.isabs(path):
        return path
    for root in (os.getcwd(), _REFERENCE_ROOT):
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(path)


class T1:
    """Static task definition + pure step/reset functions.

    Construction parses the asset and precomputes every static array; no
    state lives on the instance (it is all in EnvParams/EnvState pytrees).
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.num_envs = cfg["env"]["num_envs"]
        self.num_obs = cfg["env"]["num_observations"]
        self.num_privileged_obs = cfg["env"]["num_privileged_obs"]
        self.num_actions = cfg["env"]["num_actions"]
        self.decimation = cfg["control"]["decimation"]
        self.sim_dt = cfg["sim"]["dt"]
        self.dt = self.decimation * self.sim_dt  # envs/t1.py:191

        self.model = load_urdf(
            _resolve_asset(cfg["asset"]["file"]),
            cylinder_rim_points=int(cfg["asset"].get(
                "cylinder_rim_points", 6)))
        if cfg["asset"].get("collision_source") == "mjcf":
            # sample contact points from the MJCF collision geoms instead
            # of the URDF primitives: contact-geometry parity with the
            # MuJoCo oracle (see model/mjcf_points.py — the two files
            # disagree by up to 8 cm exactly on the kneeling surfaces)
            from booster_gym_tpu.model.mjcf_points import with_mjcf_collision

            self.model = with_mjcf_collision(
                self.model, _resolve_asset(cfg["asset"]["mujoco_file"]))
        nd = self.model.num_dofs
        assert nd == self.num_actions

        solver = cfg["sim"].get("solver", {})
        self.sim_cfg = SimConfig(
            dt=self.sim_dt,
            gravity=tuple(cfg["sim"]["gravity"]),
            solver_iterations=int(solver.get("iterations", 4)),
            baumgarte=float(solver.get("baumgarte", 0.2)),
            contact_slop=float(solver.get("contact_slop", 0.001)),
            max_pushout_vel=float(solver.get("max_pushout_vel", 1.0)),
            bounce_threshold=float(solver.get("bounce_threshold", 0.2)),
            relaxation=float(solver.get("relaxation", 1.0)),
            terrain_friction=float(cfg["terrain"]["static_friction"]),
            terrain_restitution=float(cfg["terrain"]["restitution"]),
        )
        self.terrain = Terrain(cfg["terrain"], seed=cfg["basic"].get("seed", 0) or 0)
        self.fk = make_fk(self.model)

        # --- PD gains by joint-name substring (envs/t1.py:72-80)
        stiff = np.zeros(nd)
        damp = np.zeros(nd)
        for i, name in enumerate(self.model.dof_names):
            found = False
            for key in cfg["control"]["stiffness"]:
                if key in name:
                    stiff[i] = cfg["control"]["stiffness"][key]
                    damp[i] = cfg["control"]["damping"][key]
                    found = True
            if not found:
                raise ValueError(f"PD gain of joint {name} were not defined")
        self.base_stiffness = stiff
        self.base_damping = damp
        self.torque_limits = jnp.asarray(self.model.dof_effort, jnp.float32)
        self.dof_vel_limits = jnp.asarray(self.model.dof_vel_limit, jnp.float32)
        self.dof_lower = jnp.asarray(self.model.dof_lower, jnp.float32)
        self.dof_upper = jnp.asarray(self.model.dof_upper, jnp.float32)

        # --- default joint angles by substring with "default" fallback
        # (envs/t1.py:264-272)
        defaults = np.zeros(nd)
        angle_cfg = cfg["init_state"]["default_joint_angles"]
        for i, name in enumerate(self.model.dof_names):
            found = False
            for key in angle_cfg:
                if key != "default" and key in name:
                    defaults[i] = angle_cfg[key]
                    found = True
            if not found:
                defaults[i] = angle_cfg["default"]
        self.default_dof_pos = jnp.asarray(defaults, jnp.float32)

        # --- contact body index sets by substring (envs/t1.py:85-100)
        names = self.model.body_names
        self.penalized_contact_indices = np.array(
            [i for i, n in enumerate(names)
             if any(s in n for s in cfg["rewards"]["penalize_contacts_on"])],
            dtype=np.int32,
        )
        self.termination_contact_indices = np.array(
            [i for i, n in enumerate(names)
             if any(s in n for s in cfg["rewards"]["terminate_contacts_on"])],
            dtype=np.int32,
        )
        self.base_index = names.index(cfg["asset"]["base_name"])
        self.feet_indices = np.array(
            [names.index(n) for n in cfg["asset"]["foot_names"]], dtype=np.int32
        )
        self.foot_shape_indices = np.array(
            [s for f in self.feet_indices for s in self.model.shape_indices_of_body(int(f))],
            dtype=np.int32,
        )
        self.feet_edge_pos = jnp.asarray(cfg["asset"]["feet_edge_pos"], jnp.float32)

        # --- init state (envs/T1.yaml:84-89; rot stored xyzw there)
        rot = cfg["init_state"]["rot"]
        self.base_init_pos = np.asarray(cfg["init_state"]["pos"], np.float32)
        self.base_init_quat = np.asarray([rot[3], rot[0], rot[1], rot[2]], np.float32)
        self.base_init_lin_vel = np.asarray(cfg["init_state"]["lin_vel"], np.float32)
        self.base_init_ang_vel = np.asarray(cfg["init_state"]["ang_vel"], np.float32)

        self.env_origins = jnp.asarray(self._compute_env_origins(), jnp.float32)

        # --- reward registry: non-zero scales only, pre-multiplied by dt
        # (envs/t1.py:279-285)
        self.reward_scales = {
            k: v * self.dt for k, v in cfg["rewards"]["scales"].items() if v != 0
        }

        # episode constants
        self.max_episode_length = int(np.ceil(cfg["rewards"]["episode_length_s"] / self.dt))
        self.kick_interval = int(np.ceil(cfg["randomization"]["kick_interval_s"] / self.dt))
        self.push_interval = int(np.ceil(cfg["randomization"]["push_interval_s"] / self.dt))
        self.push_duration = int(np.ceil(cfg["randomization"]["push_duration_s"] / self.dt))
        cc = cfg["commands"]
        self.curriculum_shape = (1 + 2 * cc["lin_vel_levels"], 1 + 2 * cc["ang_vel_levels"])

        # multi-device: set_mesh() shards the packed physics inner loop over
        # the env axis (everything else shards by NamedSharding propagation)
        self.mesh = None
        self.axis_name = "dp"

        # backend selection last: it needs the feet indices for the
        # engine-side feet outputs
        self.substep = self._select_backend(cfg)

        # trimesh + Pallas: one sampler kernel answers every terrain query
        # of a step (contact points + root + foot edges) without gathers
        self.terrain_sampler = None
        if self.pallas_backend and self.terrain.type != "plane":
            from booster_gym_tpu.terrain.sample_kernel import make_terrain_sampler

            n_queries = (self.model.num_points + 1
                         + len(self.feet_indices) * self.feet_edge_pos.shape[0])
            self.terrain_sampler = make_terrain_sampler(
                self.terrain, n_queries,
                interpret=jax.default_backend() != "tpu")

    # ------------------------------------------------------------------
    def _select_backend(self, cfg):
        """Pick the physics backend: the Pallas substep kernel runs ~100x
        faster than the XLA-op engine on TPU; 'pallas_interpret' forces the
        kernel through the Pallas interpreter (CPU correctness/dryrun);
        everything else falls back to the XLA path.  Batches of any size are
        supported — the kernel pads to its [8,128]-tile granularity."""
        import jax

        from booster_gym_tpu.physics.pallas_engine import make_substep_pallas

        backend = cfg["sim"].get("backend", "auto")
        self.pallas_backend = backend in (
            "pallas", "pallas_interpret", "pallas_emulate") or (
            backend == "auto" and jax.default_backend() == "tpu")
        if self.pallas_backend:
            interpret = {"pallas_interpret": True,
                         "pallas_emulate": "emulate"}.get(backend, False)
            # flat terrain: specialize the kernel (h=0, n=z baked in) —
            # drops the per-substep ph/pn inputs + ptxy output DMA
            return make_substep_pallas(
                self.model, self.sim_cfg, feet_indices=self.feet_indices,
                interpret=interpret, plane=self.terrain.type == "plane")
        return make_substep(
            self.model, self.sim_cfg, self.terrain, feet_indices=self.feet_indices)

    def set_mesh(self, mesh, axis_name="dp"):
        """Run the physics inner loop under shard_map over `axis_name` of
        `mesh` (env-batch data parallelism).  The rest of the step shards by
        sharding propagation — XLA inserts the collectives (SURVEY.md §5.8)."""
        self.mesh = mesh
        self.axis_name = axis_name

    # ------------------------------------------------------------------
    def _compute_env_origins(self):
        """Grid env origins (envs/t1.py:169-185)."""
        B = self.num_envs
        origins = np.zeros((B, 3), np.float32)
        if self.terrain.type == "plane":
            num_cols = np.floor(np.sqrt(B))
            num_rows = np.ceil(B / num_cols)
            xx, yy = np.meshgrid(np.arange(num_rows), np.arange(num_cols), indexing="ij")
            spacing = self.cfg["env"]["env_spacing"]
            origins[:, 0] = spacing * xx.flatten()[:B]
            origins[:, 1] = spacing * yy.flatten()[:B]
        else:
            t = self.terrain
            num_cols = max(1.0, np.floor(np.sqrt(B * t.env_length / t.env_width)))
            num_rows = np.ceil(B / num_cols)
            xx, yy = np.meshgrid(np.arange(num_rows), np.arange(num_cols), indexing="ij")
            origins[:, 0] = t.env_width / (num_rows + 1) * (xx.flatten()[:B] + 1)
            origins[:, 1] = t.env_length / (num_cols + 1) * (yy.flatten()[:B] + 1)
            origins[:, 2] = np.asarray(t.heights(jnp.asarray(origins[:, :2])))
        return origins

    # ------------------------------------------------------------------
    def init_params(self, key):
        """Per-env creation-time randomization (envs/t1.py:69-83, :139-167)."""
        B, nb, nd = self.num_envs, self.model.num_bodies, self.model.num_dofs
        ns = len(self.model.shape_body)
        rcfg = self.cfg["randomization"]
        keys = jax.random.split(key, 12)

        stiffness = apply_randomization(
            keys[0], jnp.tile(jnp.asarray(self.base_stiffness, jnp.float32), (B, 1)),
            rcfg.get("dof_stiffness"))
        damping = apply_randomization(
            keys[1], jnp.tile(jnp.asarray(self.base_damping, jnp.float32), (B, 1)),
            rcfg.get("dof_damping"))
        friction = apply_randomization(
            keys[2], jnp.zeros((B, nd)), rcfg.get("dof_friction"))

        # rigid-body randomization (envs/t1.py:139-160)
        mass = jnp.tile(jnp.asarray(self.model.body_mass, jnp.float32), (B, 1))
        com = jnp.tile(jnp.asarray(self.model.body_com, jnp.float32), (B, 1, 1))
        inertia = jnp.tile(jnp.asarray(self.model.body_inertia, jnp.float32), (B, 1, 1, 1))

        bi = self.base_index
        base_com, com_noise = apply_randomization(
            keys[3], com[:, bi], rcfg.get("base_com"), return_noise=True)
        base_mass, mass_noise = apply_randomization(
            keys[4], mass[:, bi], rcfg.get("base_mass"), return_noise=True)
        com = com.at[:, bi].set(base_com)
        mass = mass.at[:, bi].set(base_mass)
        base_mass_scaled = jnp.concatenate([com_noise, mass_noise[:, None]], axis=-1)

        other = jnp.arange(nb) != bi
        other_com = apply_randomization(keys[5], com, rcfg.get("other_com"))
        other_mass = apply_randomization(keys[6], mass, rcfg.get("other_mass"))
        com = jnp.where(other[None, :, None], other_com, com)
        mass = jnp.where(other[None, :], other_mass, mass)
        # note: the reference scales masses but leaves rotational inertia
        # untouched (envs/t1.py:139-160 sets only com/mass); we do the same.

        shape_friction = jnp.ones((B, ns))
        shape_restitution = jnp.zeros((B, ns))
        if rcfg.get("randomize_all_shapes", False):
            # tasks whose contact set is the whole body (standup: knees,
            # hands, torso all bear load) randomize every collision shape;
            # the reference's walk task randomizes foot shapes only
            # (envs/t1.py:162-167), which is the default below
            shape_friction = apply_randomization(
                keys[7], jnp.zeros((B, ns)), rcfg.get("friction"))
            shape_restitution = apply_randomization(
                keys[8], jnp.zeros((B, ns)), rcfg.get("restitution"))
        else:
            f = apply_randomization(
                keys[7], jnp.zeros((B, len(self.foot_shape_indices))), rcfg.get("friction"))
            r = apply_randomization(
                keys[8], jnp.zeros((B, len(self.foot_shape_indices))), rcfg.get("restitution"))
            shape_friction = shape_friction.at[:, self.foot_shape_indices].set(f)
            shape_restitution = shape_restitution.at[:, self.foot_shape_indices].set(r)

        dyn = DynParams(
            body_mass=mass, body_com=com, body_inertia=inertia,
            shape_friction=shape_friction, shape_restitution=shape_restitution,
        )
        if self.terrain.height_field is not None:
            from booster_gym_tpu.terrain.sample_kernel import build_shift_table

            hf = self.terrain.height_field
            table = build_shift_table(hf)
        else:
            hf = jnp.zeros((1, 1), jnp.float32)
            table = jnp.zeros((1, 8, 128), jnp.float32)
        return EnvParams(
            dyn=dyn, dof_stiffness=stiffness, dof_damping=damping,
            dof_friction=friction, base_mass_scaled=base_mass_scaled,
            env_origins=self.env_origins, height_field=hf,
            terrain_table=table,
        )

    # ------------------------------------------------------------------
    def _zero_state(self, key):
        B, nb, nd, na = self.num_envs, self.model.num_bodies, self.model.num_dofs, self.num_actions
        z = jnp.zeros
        sim = SimState(
            root_pos=jnp.tile(jnp.asarray(self.base_init_pos), (B, 1)),
            root_quat=jnp.tile(jnp.asarray(self.base_init_quat), (B, 1)),
            root_lin_vel=z((B, 3)), root_ang_vel=z((B, 3)),
            q=jnp.tile(self.default_dof_pos, (B, 1)), qd=z((B, nd)),
        )
        cc = self.cfg["commands"]
        prob = z(self.curriculum_shape)
        prob = prob.at[cc["lin_vel_levels"], cc["ang_vel_levels"]].set(1.0)
        return EnvState(
            sim=sim, key=key,
            actions=z((B, na)), last_actions=z((B, na)),
            last_dof_targets=sim.q, delay_steps=z(B, jnp.int32),
            torques=z((B, nd)), last_dof_vel=z((B, nd)), last_root_vel=z((B, 6)),
            episode_length=z(B, jnp.int32), common_step_counter=jnp.int32(0),
            reset_buf=jnp.ones(B, bool), time_out_buf=z(B, bool),
            commands=z((B, 3)), cmd_resample_time=z(B, jnp.int32),
            gait_frequency=z(B), gait_process=z(B),
            filtered_lin_vel=z((B, 3)), filtered_ang_vel=z((B, 3)),
            curriculum_prob=prob, env_curriculum_level=z((B, 2), jnp.int32),
            push_force=z((B, 3)), push_torque=z((B, 3)),
            last_feet_pos=z((B, 2, 3)), feet_pos=z((B, 2, 3)),
            feet_roll=z((B, 2)), feet_yaw=z((B, 2)), feet_contact=z((B, 2), bool),
            contact_forces=z((B, nb, 3)),
            base_lin_vel=z((B, 3)), base_ang_vel=z((B, 3)),
            projected_gravity=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (B, 1)),
            terrain_height_root=z((B,)),
            point_heights=z((B, self.model.num_points)),
            point_normals=z((B, self.model.num_points, 3)).at[:, :, 2].set(1.0),
        )

    def reset_all(self, params, key):
        """Full reset (reference reset(): envs/t1.py:294-299)."""
        state = self._zero_state(key)
        mask = jnp.ones(self.num_envs, bool)
        key, k1, k2 = jax.random.split(state.key, 3)
        state = state.replace(key=key)
        state = self._reset_envs(params, state, mask, k1)
        state = state.replace(terrain_height_root=self.terrain.heights(
            state.sim.root_pos[:, :2], params.height_field))
        state = self._refresh_point_terrain(state)
        state = self._refresh_post_physics(params, state)
        state = state.replace(
            filtered_lin_vel=jnp.zeros_like(state.filtered_lin_vel),
            filtered_ang_vel=jnp.zeros_like(state.filtered_ang_vel),
        )
        state = self._resample_commands(state, k2)
        key, k_obs = jax.random.split(state.key)
        state = state.replace(key=key)
        state, obs, privileged = self._observe(params, state, k_obs)
        info = {
            "privileged_obs": privileged,
            "time_outs": state.time_out_buf,
            "rew_terms": {k: jnp.zeros(self.num_envs) for k in self.reward_scales},
        }
        return state, obs, info

    # ------------------------------------------------------------------
    def _physics_inner_loop_packed(self, params, state, dof_targets,
                                   push_f_w, push_t_w):
        """Decimation loop entirely in the Pallas kernel's packed layout;
        under a mesh it runs inside shard_map so each device executes the
        kernel on its own env shard (pallas_call is not auto-partitionable;
        everything per-env is embarrassingly parallel, so the body needs no
        collectives)."""
        args = (state.sim, params.dyn, params.dof_stiffness,
                params.dof_damping, params.dof_friction, state.delay_steps,
                dof_targets, state.last_dof_targets, push_f_w, push_t_w,
                state.point_heights, state.point_normals)
        if self.mesh is not None:
            from jax.sharding import PartitionSpec

            spec = PartitionSpec(self.axis_name)
            # check_vma=False: pallas_call outputs carry no varying-mesh-
            # axes metadata, so shard_map's vma check rejects kernel bodies
            fn = jax.shard_map(
                self._packed_inner, mesh=self.mesh,
                in_specs=spec, out_specs=spec, check_vma=False)
            return fn(*args)
        return self._packed_inner(*args)

    def _packed_inner(self, sim_in, dyn, kp, kd, dof_fric, delay_steps,
                      dof_targets, last_dof_targets, push_f_w, push_t_w,
                      point_heights, point_normals):
        """Packed-layout decimation loop over a (possibly per-device) batch:
        state, PD math, and delay latching stay [comp, G, 8, 128] across all
        substeps — packing/unpacking happens once per control step instead
        of once per substep (~11 ms/iter saved at 4096 envs).  All inputs
        and outputs are batch-leading arrays; the batch may be any size
        (the kernel pads to tile granularity)."""
        sub = self.substep
        nd = self.model.num_dofs
        B = sim_in.q.shape[0]
        pack = sub.pack
        psim = sub.pack_sim(sim_in)
        pdyn = sub.pack_dyn(dyn)
        p_targets = pack(dof_targets, nd)
        p_last = pack(last_dof_targets, nd)
        p_kp = pack(kp, nd)
        p_kd = pack(kd, nd)
        p_fric = pack(dof_fric, nd)
        p_delay = pack(delay_steps.astype(jnp.int32)[:, None], 1)
        p_ext = pack(jnp.concatenate([push_f_w, push_t_w], axis=-1), 6)
        p_ext0 = jnp.zeros_like(p_ext)
        plane = getattr(sub, "plane", False)
        if plane:
            ph = pn = None  # baked into the kernel — no terrain DMA
        else:
            ph = pack(point_heights, self.model.num_points)
            pn = pack(point_normals.reshape(B, -1), self.model.num_points * 3)
        lim = jnp.asarray(self.torque_limits)[:, None, None, None]

        def body(carry, i):
            psim, p_last, p_tsum = carry
            latch = p_delay[0] == i                      # [G, 8, 128] bool
            p_last = jnp.where(latch[None], p_targets, p_last)
            pd = p_kp * (p_last - psim[4]) - p_kd * psim[5]
            fric = jnp.minimum(jnp.abs(pd), p_fric) * jnp.sign(pd)
            p_tau = jnp.clip(pd - fric, -lim, lim)
            ext = jnp.where(i == 0, p_ext, p_ext0)
            psim, pforces, pfeet, pptxy = sub.packed_call(
                psim, pdyn, p_tau, ext, ph, pn)
            return (psim, p_last, p_tsum + p_tau), (pforces, pfeet, pptxy)

        (psim, p_last, p_tsum), (pf_seq, pfeet_seq, pptxy_seq) = jax.lax.scan(
            body, (psim, p_last, jnp.zeros_like(p_targets)),
            jnp.arange(self.decimation))

        sim = sub.unpack_sim(psim, B)
        last_targets = sub.unpack(p_last, B)
        torques = sub.unpack(p_tsum, B) / self.decimation
        nb, nf = self.model.num_bodies, len(self.feet_indices)
        forces = sub.unpack(pf_seq[-1], B).reshape(B, nb, 3)
        feet = sub.unpack(pfeet_seq[-1], B).reshape(B, nf, 12)
        feet_pos = feet[:, :, 0:3]
        feet_R = feet[:, :, 3:12].reshape(B, nf, 3, 3)
        if plane:
            # unused on flat terrain (terrain_sampler is None); see step()
            pt_xy = jnp.zeros((B, self.model.num_points, 2))
        else:
            pt_xy = sub.unpack(pptxy_seq[-1], B).reshape(
                B, self.model.num_points, 2)
        return sim, last_targets, torques, forces, feet_pos, feet_R, pt_xy

    # ------------------------------------------------------------------
    def _sample_terrain(self, table, root_xy, queries):
        """Terrain sampler call, shard_map'd under a mesh: pallas_call is
        not auto-partitionable, so like the physics inner loop each device
        runs the sampler on its own env shard (the shift table replicates;
        queries are per-env, no collectives needed)."""
        if self.mesh is None:
            return self.terrain_sampler(table, root_xy, queries)
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            self.terrain_sampler, mesh=self.mesh,
            in_specs=(P(), P(self.axis_name), P(self.axis_name)),
            out_specs=P(self.axis_name), check_vma=False)
        return fn(table, root_xy, queries)

    # ------------------------------------------------------------------
    def _refresh_point_terrain(self, state):
        """Initialize the carried per-point terrain heights/normals from the
        current pose (reset_all only; during stepping they ride one substep
        stale through the rollout scan — see pallas_engine)."""
        from booster_gym_tpu.physics.kinematics import point_world_positions

        body_R, body_pos = self.fk(state.sim)
        pts = point_world_positions(self.model, body_R, body_pos)
        return state.replace(
            point_heights=self.terrain.heights(pts[..., :2]),
            point_normals=self.terrain.normals(pts[..., :2]))

    # ------------------------------------------------------------------
    def _reset_envs(self, params, state, mask, key):
        """Masked re-init of terminated envs (envs/t1.py:301-341)."""
        B, nd = self.num_envs, self.model.num_dofs
        rcfg = self.cfg["randomization"]
        keys = jax.random.split(key, 6)
        m1 = mask[:, None]

        curriculum_prob = self._update_curriculum(state, mask)

        # dofs (envs/t1.py:319-321)
        dof_pos = apply_randomization(
            keys[0], jnp.tile(self.default_dof_pos, (B, 1)), rcfg.get("init_dof_pos"))
        q = jnp.where(m1, dof_pos, state.sim.q)
        qd = jnp.where(m1, 0.0, state.sim.qd)

        # root states (envs/t1.py:327-341)
        pos_xy = params.env_origins[:, :2] + self.base_init_pos[:2]
        pos_xy = apply_randomization(keys[1], pos_xy, rcfg.get("init_base_pos_xy"))
        pos_z = self.base_init_pos[2] + self.terrain.heights(
            pos_xy, params.height_field)
        yaw = jax.random.uniform(keys[2], (B,)) * 2 * jnp.pi
        quat = quat_from_euler_xyz(jnp.zeros(B), jnp.zeros(B), yaw)
        lin_xy = apply_randomization(keys[3], jnp.zeros((B, 2)), rcfg.get("init_base_lin_vel_xy"))
        lin_vel = jnp.concatenate([lin_xy, jnp.zeros((B, 1))], axis=-1) + self.base_init_lin_vel
        ang_vel = jnp.tile(jnp.asarray(self.base_init_ang_vel), (B, 1))

        sim = SimState(
            root_pos=jnp.where(m1, jnp.concatenate([pos_xy, pos_z[:, None]], -1), state.sim.root_pos),
            root_quat=jnp.where(m1, quat, state.sim.root_quat),
            root_lin_vel=jnp.where(m1, lin_vel, state.sim.root_lin_vel),
            root_ang_vel=jnp.where(m1, ang_vel, state.sim.root_ang_vel),
            q=q, qd=qd,
        )

        delay = jax.random.randint(keys[4], (B,), 0, self.decimation)
        return state.replace(
            sim=sim,
            curriculum_prob=curriculum_prob,
            last_dof_targets=jnp.where(m1, q, state.last_dof_targets),
            last_root_vel=jnp.where(
                m1, jnp.concatenate([lin_vel, ang_vel], -1), state.last_root_vel),
            episode_length=jnp.where(mask, 0, state.episode_length),
            filtered_lin_vel=jnp.where(m1, 0.0, state.filtered_lin_vel),
            filtered_ang_vel=jnp.where(m1, 0.0, state.filtered_ang_vel),
            cmd_resample_time=jnp.where(mask, 0, state.cmd_resample_time),
            delay_steps=jnp.where(mask, delay, state.delay_steps),
        )

    # ------------------------------------------------------------------
    def _update_curriculum(self, state, mask):
        """Success-diffusion on the command grid (envs/t1.py:391-413).

        The reference's sequential per-env loop is replaced by an
        order-insensitive scatter-add (addition commutes; the reference also
        clamps only once at the end)."""
        cc = self.cfg["commands"]
        if not cc["curriculum"]:
            return state.curriculum_prob
        success = state.episode_length > np.ceil(
            self.cfg["rewards"]["episode_length_s"] / self.dt
        ) * (1 - cc["episode_length_toler"])
        success &= jnp.abs(state.filtered_lin_vel[:, 0] - state.commands[:, 0]) < cc["lin_vel_x_toler"]
        success &= jnp.abs(state.filtered_lin_vel[:, 1] - state.commands[:, 1]) < cc["lin_vel_y_toler"]
        success &= jnp.abs(state.filtered_ang_vel[:, 2] - state.commands[:, 2]) < cc["ang_vel_yaw_toler"]
        success &= mask

        x = state.env_curriculum_level[:, 0] + cc["lin_vel_levels"]
        y = state.env_curriculum_level[:, 1] + cc["ang_vel_levels"]
        w = jnp.where(success, cc["update_rate"], 0.0)
        H, W = self.curriculum_shape
        prob = state.curriculum_prob
        flat = prob.reshape(-1)
        idx = x * W + y
        flat = flat.at[idx].add(w)
        flat = flat.at[jnp.where(x > 0, (x - 1) * W + y, idx)].add(jnp.where(x > 0, w, 0.0))
        flat = flat.at[jnp.where(x < H - 1, (x + 1) * W + y, idx)].add(jnp.where(x < H - 1, w, 0.0))
        flat = flat.at[jnp.where(y > 0, x * W + y - 1, idx)].add(jnp.where(y > 0, w, 0.0))
        flat = flat.at[jnp.where(y < W - 1, x * W + y + 1, idx)].add(jnp.where(y < W - 1, w, 0.0))
        return jnp.clip(flat.reshape(H, W), max=1.0)

    # ------------------------------------------------------------------
    def _resample_commands(self, state, key):
        """Command/gait resampling at per-env resample times
        (envs/t1.py:362-389)."""
        cc = self.cfg["commands"]
        B = self.num_envs
        mask = state.episode_length == state.cmd_resample_time
        keys = jax.random.split(key, 8)

        if cc["curriculum"]:
            commands, levels = self._sample_curriculum_commands(state, keys)
        else:
            levels = state.env_curriculum_level
            commands = jnp.stack(
                [
                    jax.random.uniform(keys[0], (B,), minval=cc["lin_vel_x"][0], maxval=cc["lin_vel_x"][1]),
                    jax.random.uniform(keys[1], (B,), minval=cc["lin_vel_y"][0], maxval=cc["lin_vel_y"][1]),
                    jax.random.uniform(keys[2], (B,), minval=cc["ang_vel_yaw"][0], maxval=cc["ang_vel_yaw"][1]),
                ],
                axis=-1,
            )
        gait_freq = jax.random.uniform(
            keys[3], (B,), minval=cc["gait_frequency"][0], maxval=cc["gait_frequency"][1])
        if cc.get("still_mode", "bernoulli") == "exact_fraction":
            # reference-exact semantics (envs/t1.py:381): of the k envs
            # resampling this step, exactly int(p*k) uniformly-random ones
            # go still.  Rank the resampling envs by a random score and take
            # the first floor(p*k).
            score = jnp.where(mask, jax.random.uniform(keys[4], (B,)), jnp.inf)
            rank = jnp.zeros(B, jnp.int32).at[jnp.argsort(score)].set(jnp.arange(B, dtype=jnp.int32))
            k_still = jnp.floor(cc["still_proportion"] * mask.sum()).astype(jnp.int32)
            still = mask & (rank < k_still)
        else:
            # per-env Bernoulli(p) — same expectation, order-free (documented
            # divergence in the module docstring; A/B via tools/ab_divergence)
            still = jax.random.bernoulli(keys[4], cc["still_proportion"], (B,))
        commands = jnp.where(still[:, None], 0.0, commands)
        gait_freq = jnp.where(still, 0.0, gait_freq)

        next_time = state.cmd_resample_time + jax.random.randint(
            keys[5], (B,),
            int(cc["resampling_time_s"][0] / self.dt),
            int(cc["resampling_time_s"][1] / self.dt),
        )
        return state.replace(
            commands=jnp.where(mask[:, None], commands, state.commands),
            gait_frequency=jnp.where(mask, gait_freq, state.gait_frequency),
            cmd_resample_time=jnp.where(mask, next_time, state.cmd_resample_time),
            env_curriculum_level=jnp.where(mask[:, None], levels, state.env_curriculum_level),
        )

    def _sample_curriculum_commands(self, state, keys):
        """Grid-categorical command sampling (envs/t1.py:415-435)."""
        cc = self.cfg["commands"]
        B = self.num_envs
        H, W = self.curriculum_shape
        logits = jnp.log(jnp.maximum(state.curriculum_prob.reshape(-1), 1e-20))
        grid_idx = jax.random.categorical(keys[6], logits, shape=(B,))
        if cc.get("curriculum_transpose_quirk", False):
            # replicate the reference's axis swap (envs/t1.py:417-418): the
            # update writes prob[lin, ang] but sampling reads lin from the
            # COLUMN index — transposed.  Shape-consistent only for square
            # grids; kept behind a flag for A/B (tools/ab_divergence).
            assert H == W, "reference transpose quirk is square-grid-only"
            lin_level = grid_idx % W - cc["lin_vel_levels"]
            ang_level = grid_idx // W - cc["ang_vel_levels"]
        else:
            lin_level = grid_idx // W - cc["lin_vel_levels"]
            ang_level = grid_idx % W - cc["ang_vel_levels"]
        jitter = jax.random.uniform(keys[7], (B, 3), minval=-1.0, maxval=1.0)
        commands = jnp.stack(
            [
                (lin_level + 0.5 * jitter[:, 0]) * cc["lin_vel_x_resolution"],
                jnp.abs(lin_level) * jitter[:, 1] * cc["lin_vel_y_resolution"],
                (ang_level + 0.5 * jitter[:, 2]) * cc["ang_vel_resolution"],
            ],
            axis=-1,
        )
        levels = jnp.stack([lin_level, ang_level], axis=-1).astype(jnp.int32)
        return commands, levels

    # ------------------------------------------------------------------
    def _apply_actions(self, actions):
        """actions -> (clipped actions, full-dim PD targets).  Subclass hook:
        tasks whose action space is a subset of the actuated dofs (standup)
        override the mapping (reference envs/t1.py:437-441)."""
        cfg = self.cfg
        clip = cfg["normalization"]["clip_actions"]
        actions = jnp.clip(actions, -clip, clip)
        return actions, self.default_dof_pos + cfg["control"]["action_scale"] * actions

    def step(self, params, state, actions):
        """One control step (envs/t1.py:437-497)."""
        cfg = self.cfg
        actions, dof_targets = self._apply_actions(actions)

        key, k_step = jax.random.split(state.key)
        state = state.replace(key=key, actions=actions)

        # --- physics inner loop (envs/t1.py:443-456)
        push_f_w = quat_rotate(state.sim.root_quat, state.push_force)
        push_t_w = quat_rotate(state.sim.root_quat, state.push_torque)
        zeros3 = jnp.zeros_like(push_f_w)

        if self.pallas_backend:
            sim, last_targets, torques, forces, feet_pos, feet_R, pt_xy = (
                self._physics_inner_loop_packed(params, state, dof_targets,
                                                push_f_w, push_t_w))
        else:
            def loop_body(carry, i):
                sim, last_targets, torque_sum = carry
                last_targets = jnp.where(
                    (state.delay_steps == i)[:, None], dof_targets, last_targets)
                pd = (params.dof_stiffness * (last_targets - sim.q)
                      - params.dof_damping * sim.qd)
                fric = jnp.minimum(jnp.abs(pd), params.dof_friction) * jnp.sign(pd)
                tau = jnp.clip(pd - fric, -self.torque_limits, self.torque_limits)
                ef = jnp.where(i == 0, push_f_w, zeros3)
                et = jnp.where(i == 0, push_t_w, zeros3)
                sim, forces, feet_pos, feet_R = self.substep(sim, params.dyn, tau, ef, et)
                return (sim, last_targets, torque_sum + tau), (forces, feet_pos, feet_R)

            (sim, last_targets, torque_sum), (forces_seq, feet_pos_seq, feet_R_seq) = jax.lax.scan(
                loop_body,
                (state.sim, state.last_dof_targets, jnp.zeros_like(state.torques)),
                jnp.arange(self.decimation),
            )
            torques = torque_sum / self.decimation
            forces, feet_pos, feet_R = forces_seq[-1], feet_pos_seq[-1], feet_R_seq[-1]
            pt_xy = jnp.zeros((self.num_envs, self.model.num_points, 2))

        state = state.replace(
            sim=sim,
            last_dof_targets=last_targets,
            torques=torques,
            contact_forces=forces,
        )
        # (pt_xy from the last substep feeds the terrain refresh after resets)

        # --- post-physics (envs/t1.py:459-497)
        # one terrain-sampler kernel call answers every query of the step:
        # all contact points, the root, and the foot edge points (terrain/
        # sample_kernel.py; XLA gathers would cost ~25 ms at 8192 envs)
        edge_x, edge_y, edge_z = self._feet_edge_world(feet_pos, feet_R)
        pt_h = pt_n = root_h = edge_h = None
        if self.terrain_sampler is not None:
            B, npt = self.num_envs, self.model.num_points
            nf, ne = edge_z.shape[1], edge_z.shape[2]
            edge_xy = jnp.stack(
                [edge_x.reshape(B, nf * ne), edge_y.reshape(B, nf * ne)],
                axis=-1)
            queries = jnp.concatenate([
                pt_xy,
                state.sim.root_pos[:, None, :2],
                edge_xy,
            ], axis=1)
            h_all, n_all = self._sample_terrain(
                params.terrain_table, state.sim.root_pos[:, :2], queries)
            pt_h, pt_n = h_all[:, :npt], n_all[:, :npt]
            root_h = h_all[:, npt]
            edge_h = h_all[:, npt + 1:].reshape(B, nf, ne)
        else:
            root_h = self.terrain.heights(
                state.sim.root_pos[:, :2], params.height_field)
        state = state.replace(terrain_height_root=root_h)
        state = self._refresh_post_physics(
            params, state, feet_pos=feet_pos, feet_R=feet_R,
            edge_xyz=(edge_x, edge_y, edge_z), edge_heights=edge_h)
        state = state.replace(
            episode_length=state.episode_length + 1,
            common_step_counter=state.common_step_counter + 1,
            gait_process=jnp.mod(
                state.gait_process + self.dt * state.gait_frequency, 1.0),
        )

        keys = jax.random.split(k_step, 8)
        state = self._kick_robots(state, keys[0])
        state = self._push_robots(state, keys[1])
        state = self._check_termination(state)
        rew, rew_terms = self._compute_reward(params, state)

        reset_mask = state.reset_buf
        state = self._reset_envs(params, state, reset_mask, keys[2])
        state, moved_mask = self._teleport_robots(state)
        if self.pallas_backend and self.terrain.type != "plane":
            # carry the sampled contact-point terrain (EXACT heights/
            # normals for every collision point) into the next control
            # step.  Reset or teleported envs have stale pt_xy and fall
            # back to the value under their new root (one small direct
            # gather) until their first step completes.
            fix = reset_mask | moved_mask
            h_root2, n_root2 = self.terrain.heights_and_normals(
                state.sim.root_pos[:, :2], params.height_field)
            state = state.replace(
                point_heights=jnp.where(fix[:, None], h_root2[:, None], pt_h),
                point_normals=jnp.where(
                    fix[:, None, None], n_root2[:, None, :], pt_n),
                terrain_height_root=jnp.where(
                    fix, h_root2, state.terrain_height_root))
        elif self.terrain.type != "plane":
            # XLA-engine backend queries terrain inside the substep; only
            # the root height needs a post-reset refresh here
            fix = reset_mask | moved_mask
            state = state.replace(terrain_height_root=jnp.where(
                fix, self.terrain.heights(
                    state.sim.root_pos[:, :2], params.height_field),
                state.terrain_height_root))
        state = self._resample_commands(state, keys[3])
        # refresh derived quantities for envs that were reset/teleported
        state = self._refresh_post_physics(params, state, reset_mask=reset_mask)
        state, obs, privileged = self._observe(params, state, keys[4])

        state = state.replace(
            last_actions=state.actions,
            last_dof_vel=state.sim.qd,
            last_root_vel=jnp.concatenate(
                [state.sim.root_lin_vel, state.sim.root_ang_vel], axis=-1),
            last_feet_pos=state.feet_pos,
        )
        info = {
            "privileged_obs": privileged,
            "time_outs": state.time_out_buf,
            "rew_terms": rew_terms,
        }
        return state, obs, rew, reset_mask, info

    # ------------------------------------------------------------------
    def _feet_edge_world(self, feet_pos, feet_R):
        """Foot edge points in world frame as coordinate planes
        (x, y, z each [B, nf, ne]).

        Unrolled over the (static, tiny) edge set with scalar edge offsets:
        every op is elementwise on [B, nf] arrays in the natural batch-major
        layout.  The earlier nested-batch einsum ([B*nf,3,3]x[ne,3]) forced
        a {2,1,0,3}-layout [B,nf,ne,3] intermediate whose consumers (the
        edge-contact compare+reduce) cost ~120 us/step at 4096 envs."""
        px = feet_pos[..., 0]
        py = feet_pos[..., 1]
        pz = feet_pos[..., 2]
        edge = np.asarray(self.feet_edge_pos)   # static trace-time constants
        xs, ys, zs = [], [], []
        for e in range(edge.shape[0]):
            lx, ly, lz = (float(edge[e, 0]), float(edge[e, 1]),
                          float(edge[e, 2]))
            xs.append(px + feet_R[..., 0, 0] * lx + feet_R[..., 0, 1] * ly
                      + feet_R[..., 0, 2] * lz)
            ys.append(py + feet_R[..., 1, 0] * lx + feet_R[..., 1, 1] * ly
                      + feet_R[..., 1, 2] * lz)
            zs.append(pz + feet_R[..., 2, 0] * lx + feet_R[..., 2, 1] * ly
                      + feet_R[..., 2, 2] * lz)
        x = jnp.stack(xs, axis=-1)   # [B, nf, ne]
        y = jnp.stack(ys, axis=-1)
        z = jnp.stack(zs, axis=-1)
        return x, y, z

    def _refresh_post_physics(self, params, state, feet_pos=None, feet_R=None,
                              reset_mask=None, edge_xyz=None,
                              edge_heights=None):
        """Base-frame velocities, EMA filters, feet state
        (envs/t1.py:463-474, :529-549).

        Feet poses normally arrive from the physics engine (no duplicate FK
        in the env layer); when absent (reset_all) FK runs here.  The
        post-reset call (reset_mask set) refreshes only base-frame
        quantities: feet buffers stay pre-reset exactly like the reference,
        whose body-state tensor is not refreshed between a reset write and
        the next simulate (envs/t1.py:323-341 + :529)."""
        sim = state.sim
        gravity_vec = jnp.asarray([0.0, 0.0, -1.0])
        base_lin_vel = quat_rotate_inverse(sim.root_quat, sim.root_lin_vel)
        base_ang_vel = quat_rotate_inverse(sim.root_quat, sim.root_ang_vel)
        projected_gravity = quat_rotate_inverse(
            sim.root_quat, jnp.broadcast_to(gravity_vec, sim.root_lin_vel.shape))
        w = self.cfg["normalization"]["filter_weight"]
        if reset_mask is None:
            filtered_lin = base_lin_vel * w + state.filtered_lin_vel * (1 - w)
            filtered_ang = base_ang_vel * w + state.filtered_ang_vel * (1 - w)
        else:
            # refresh after reset: don't advance the EMA a second time
            filtered_lin = jnp.where(reset_mask[:, None], 0.0, state.filtered_lin_vel)
            filtered_ang = jnp.where(reset_mask[:, None], 0.0, state.filtered_ang_vel)
            return state.replace(
                base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
                projected_gravity=projected_gravity,
                filtered_lin_vel=filtered_lin, filtered_ang_vel=filtered_ang,
            )

        if feet_pos is None:
            body_R, body_pos = self.fk(sim)
            feet_R = body_R[:, self.feet_indices]        # [B, nf, 3, 3]
            feet_pos = body_pos[:, self.feet_indices]    # [B, nf, 3]
        roll = jnp.arctan2(feet_R[..., 2, 1], feet_R[..., 2, 2])
        yaw = jnp.arctan2(feet_R[..., 1, 0], feet_R[..., 0, 0])

        # edge-point contact detection (envs/t1.py:535-549)
        if edge_xyz is None:
            edge_xyz = self._feet_edge_world(feet_pos, feet_R)
        edge_x, edge_y, edge_z = edge_xyz
        if edge_heights is None:
            edge_heights = self.terrain.heights(
                jnp.stack([edge_x, edge_y], axis=-1), params.height_field)
        feet_contact = jnp.any(edge_z - edge_heights < 0.01, axis=-1)

        return state.replace(
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity,
            filtered_lin_vel=filtered_lin, filtered_ang_vel=filtered_ang,
            feet_pos=feet_pos, feet_roll=roll, feet_yaw=yaw,
            feet_contact=feet_contact,
        )

    # ------------------------------------------------------------------
    def _kick_robots(self, state, key):
        """Velocity kicks every kick_interval (envs/t1.py:499-504)."""
        rcfg = self.cfg["randomization"]
        k1, k2 = jax.random.split(key)
        do = state.common_step_counter % self.kick_interval == 0
        lin = apply_randomization(k1, state.sim.root_lin_vel, rcfg.get("kick_lin_vel"))
        ang = apply_randomization(k2, state.sim.root_ang_vel, rcfg.get("kick_ang_vel"))
        sim = state.sim.replace(
            root_lin_vel=jnp.where(do, lin, state.sim.root_lin_vel),
            root_ang_vel=jnp.where(do, ang, state.sim.root_ang_vel),
        )
        return state.replace(sim=sim)

    def _push_robots(self, state, key):
        """1 s force/torque pushes every push_interval (envs/t1.py:506-527)."""
        rcfg = self.cfg["randomization"]
        k1, k2 = jax.random.split(key)
        phase = state.common_step_counter % self.push_interval
        start = phase == 0
        stop = phase == self.push_duration
        new_f = apply_randomization(k1, jnp.zeros_like(state.push_force), rcfg.get("push_force"))
        new_t = apply_randomization(k2, jnp.zeros_like(state.push_torque), rcfg.get("push_torque"))
        force = jnp.where(start, new_f, jnp.where(stop, 0.0, state.push_force))
        torque = jnp.where(start, new_t, jnp.where(stop, 0.0, state.push_torque))
        return state.replace(push_force=force, push_torque=torque)

    # ------------------------------------------------------------------
    def _check_termination(self, state):
        """Reset & timeout flags (envs/t1.py:551-558)."""
        rcfg = self.cfg["rewards"]
        if len(self.termination_contact_indices) > 0:
            term_forces = state.contact_forces[:, self.termination_contact_indices]
            reset = jnp.any(jnp.linalg.norm(term_forces, axis=-1) > 1.0, axis=-1)
        else:
            reset = jnp.zeros(self.num_envs, bool)
        root_vel6 = jnp.concatenate([state.sim.root_lin_vel, state.sim.root_ang_vel], -1)
        reset |= jnp.sum(root_vel6 ** 2, axis=-1) > rcfg["terminate_vel"]
        height = state.sim.root_pos[:, 2] - state.terrain_height_root
        reset |= height < rcfg["terminate_height"]
        time_out = state.episode_length > self.max_episode_length
        reset |= time_out
        time_out |= state.episode_length == state.cmd_resample_time
        return state.replace(reset_buf=reset, time_out_buf=time_out)

    def _teleport_robots(self, state):
        """Wrap robots that walked off the terrain (envs/t1.py:343-359).
        Returns (state, moved_mask)."""
        if self.terrain.type == "plane":
            return state, jnp.zeros(self.num_envs, bool)
        t = self.terrain
        pos = state.sim.root_pos
        shift_x = (t.env_width + t.border_size) * (
            (pos[:, 0] < -0.75 * t.border_size).astype(jnp.float32)
            - (pos[:, 0] > t.env_width + 0.75 * t.border_size).astype(jnp.float32))
        shift_y = (t.env_length + t.border_size) * (
            (pos[:, 1] < -0.75 * t.border_size).astype(jnp.float32)
            - (pos[:, 1] > t.env_length + 0.75 * t.border_size).astype(jnp.float32))
        new_pos = pos.at[:, 0].add(shift_x).at[:, 1].add(shift_y)
        state = state.replace(sim=state.sim.replace(root_pos=new_pos))
        return state, (shift_x != 0) | (shift_y != 0)

    # ------------------------------------------------------------------
    def _observe(self, params, state, key):
        """(state, obs, privileged) — subclass hook for tasks whose
        observation carries state across steps (the standup frame stack)."""
        obs, privileged = self._compute_observations(params, state, key)
        return state, obs, privileged

    def _compute_observations(self, params, state, key):
        """47-dim actor obs + 14-dim privileged obs (envs/t1.py:574-603)."""
        ncfg = self.cfg["normalization"]
        noise = self.cfg["noise"]
        ks = jax.random.split(key, 8)
        commands_scale = jnp.asarray(
            [ncfg["lin_vel"], ncfg["lin_vel"], ncfg["ang_vel"]])
        gait_on = (state.gait_frequency > 1.0e-8).astype(jnp.float32)
        obs = jnp.concatenate(
            [
                apply_randomization(ks[0], state.projected_gravity, noise.get("gravity")) * ncfg["gravity"],
                apply_randomization(ks[1], state.base_ang_vel, noise.get("ang_vel")) * ncfg["ang_vel"],
                state.commands[:, :3] * commands_scale,
                (jnp.cos(2 * jnp.pi * state.gait_process) * gait_on)[:, None],
                (jnp.sin(2 * jnp.pi * state.gait_process) * gait_on)[:, None],
                apply_randomization(ks[2], state.sim.q - self.default_dof_pos, noise.get("dof_pos")) * ncfg["dof_pos"],
                apply_randomization(ks[3], state.sim.qd, noise.get("dof_vel")) * ncfg["dof_vel"],
                state.actions,
            ],
            axis=-1,
        )
        height = state.sim.root_pos[:, 2] - state.terrain_height_root
        privileged = jnp.concatenate(
            [
                params.base_mass_scaled,
                apply_randomization(ks[4], state.base_lin_vel, noise.get("lin_vel")) * ncfg["lin_vel"],
                apply_randomization(ks[5], height, noise.get("height"))[:, None],
                state.push_force * ncfg["push_force"],
                state.push_torque * ncfg["push_torque"],
            ],
            axis=-1,
        )
        return obs, privileged

    # ------------------------------------------------------------------
    def _compute_reward(self, params, state):
        """All reward terms (envs/t1.py:560-730); each scaled by scale*dt,
        total clipped at >= 0 when only_positive_rewards."""
        rcfg = self.cfg["rewards"]
        terms = {}
        # per-class registry so subclasses (standup) add their own terms
        fns = {n[len("_reward_"):]: getattr(type(self), n)
               for n in dir(type(self)) if n.startswith("_reward_")}
        for name, scale in self.reward_scales.items():
            terms[name] = fns[name](self, params, state) * scale
        total = sum(terms.values())
        if rcfg["only_positive_rewards"]:
            total = jnp.maximum(total, 0.0)
        return total, terms

    # --- individual reward terms (envs/t1.py:606-730) -----------------
    def _reward_survival(self, params, state):
        return jnp.ones(self.num_envs)

    def _reward_tracking_lin_vel_x(self, params, state):
        err = state.commands[:, 0] - state.filtered_lin_vel[:, 0]
        return jnp.exp(-jnp.square(err) / self.cfg["rewards"]["tracking_sigma"])

    def _reward_tracking_lin_vel_y(self, params, state):
        err = state.commands[:, 1] - state.filtered_lin_vel[:, 1]
        return jnp.exp(-jnp.square(err) / self.cfg["rewards"]["tracking_sigma"])

    def _reward_tracking_ang_vel(self, params, state):
        err = state.commands[:, 2] - state.filtered_ang_vel[:, 2]
        return jnp.exp(-jnp.square(err) / self.cfg["rewards"]["tracking_sigma"])

    def _reward_base_height(self, params, state):
        height = state.sim.root_pos[:, 2] - state.terrain_height_root
        return jnp.square(height - self.cfg["rewards"]["base_height_target"])

    def _reward_collision(self, params, state):
        f = state.contact_forces[:, self.penalized_contact_indices]
        return jnp.sum(jnp.linalg.norm(f, axis=-1) > 1.0, axis=-1).astype(jnp.float32)

    def _reward_lin_vel_z(self, params, state):
        return jnp.square(state.filtered_lin_vel[:, 2])

    def _reward_ang_vel_xy(self, params, state):
        return jnp.sum(jnp.square(state.base_ang_vel[:, :2]), axis=-1)

    def _reward_orientation(self, params, state):
        return jnp.sum(jnp.square(state.projected_gravity[:, :2]), axis=-1)

    def _reward_torques(self, params, state):
        return jnp.sum(jnp.square(state.torques), axis=-1)

    def _reward_dof_vel(self, params, state):
        return jnp.sum(jnp.square(state.sim.qd), axis=-1)

    def _reward_dof_acc(self, params, state):
        return jnp.sum(jnp.square((state.last_dof_vel - state.sim.qd) / self.dt), axis=-1)

    def _reward_root_acc(self, params, state):
        root_vel = jnp.concatenate([state.sim.root_lin_vel, state.sim.root_ang_vel], -1)
        return jnp.sum(jnp.square((state.last_root_vel - root_vel) / self.dt), axis=-1)

    def _reward_action_rate(self, params, state):
        return jnp.sum(jnp.square(state.last_actions - state.actions), axis=-1)

    def _reward_dof_pos_limits(self, params, state):
        soft = self.cfg["rewards"]["soft_dof_pos_limit"]
        lower = self.dof_lower + 0.5 * (1 - soft) * (self.dof_upper - self.dof_lower)
        upper = self.dof_upper - 0.5 * (1 - soft) * (self.dof_upper - self.dof_lower)
        # eps: our solver clamps q exactly onto the limit, the reference's
        # PhysX overshoots slightly; count saturation as violation
        eps = 1e-6
        out = (state.sim.q < lower + eps) | (state.sim.q > upper - eps)
        return jnp.sum(out.astype(jnp.float32), axis=-1)

    def _reward_dof_vel_limits(self, params, state):
        soft = self.cfg["rewards"]["soft_dof_vel_limit"]
        return jnp.sum(
            jnp.clip(jnp.abs(state.sim.qd) - self.dof_vel_limits * soft, 0.0, 1.0), axis=-1)

    def _reward_torque_limits(self, params, state):
        soft = self.cfg["rewards"]["soft_torque_limit"]
        return jnp.sum(
            jnp.clip(jnp.abs(state.torques) - self.torque_limits * soft, min=0.0), axis=-1)

    def _reward_torque_tiredness(self, params, state):
        return jnp.sum(
            jnp.clip(jnp.square(state.torques / self.torque_limits), max=1.0), axis=-1)

    def _reward_power(self, params, state):
        return jnp.sum(jnp.clip(state.torques * state.sim.qd, min=0.0), axis=-1)

    def _reward_feet_slip(self, params, state):
        vel2 = jnp.sum(jnp.square((state.last_feet_pos - state.feet_pos) / self.dt), axis=-1)
        slip = jnp.sum(vel2 * state.feet_contact.astype(jnp.float32), axis=-1)
        return slip * (state.episode_length > 1).astype(jnp.float32)

    def _reward_feet_vel_z(self, params, state):
        vz = ((state.last_feet_pos - state.feet_pos) / self.dt)[:, :, 2]
        return jnp.sum(jnp.square(vz), axis=-1)

    def _reward_feet_roll(self, params, state):
        return jnp.sum(jnp.square(state.feet_roll), axis=-1)

    def _reward_feet_yaw_diff(self, params, state):
        d = jnp.mod(state.feet_yaw[:, 1] - state.feet_yaw[:, 0] + jnp.pi, 2 * jnp.pi) - jnp.pi
        return jnp.square(d)

    def _reward_feet_yaw_mean(self, params, state):
        mean = jnp.mean(state.feet_yaw, axis=-1) + jnp.pi * (
            jnp.abs(state.feet_yaw[:, 1] - state.feet_yaw[:, 0]) > jnp.pi)
        base_yaw = euler_xyz_from_quat(state.sim.root_quat)[2]
        return jnp.square(jnp.mod(base_yaw - mean + jnp.pi, 2 * jnp.pi) - jnp.pi)

    def _reward_feet_distance(self, params, state):
        base_yaw = euler_xyz_from_quat(state.sim.root_quat)[2]
        d = jnp.abs(
            jnp.cos(base_yaw) * (state.feet_pos[:, 1, 1] - state.feet_pos[:, 0, 1])
            - jnp.sin(base_yaw) * (state.feet_pos[:, 1, 0] - state.feet_pos[:, 0, 0]))
        return jnp.clip(self.cfg["rewards"]["feet_distance_ref"] - d, 0.0, 0.1)

    def _reward_feet_swing(self, params, state):
        sp = self.cfg["rewards"]["swing_period"]
        on = state.gait_frequency > 1.0e-8
        left = (jnp.abs(state.gait_process - 0.25) < 0.5 * sp) & on
        right = (jnp.abs(state.gait_process - 0.75) < 0.5 * sp) & on
        return (left & ~state.feet_contact[:, 0]).astype(jnp.float32) + (
            right & ~state.feet_contact[:, 1]).astype(jnp.float32)


_REWARD_FUNCTIONS = {
    name[len("_reward_"):]: getattr(T1, name)
    for name in dir(T1) if name.startswith("_reward_")
}
