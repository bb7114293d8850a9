"""URDF parser -> static RobotModel pytree.

TPU-native replacement for Isaac Gym's asset loader (reference:
envs/t1.py:39-67 builds AssetOptions and reads dof limits from the asset).
Implements ``collapse_fixed_joints`` semantics (reference: envs/T1.yaml:67):
links connected by fixed joints are merged into their nearest movable
ancestor, composing transforms and combining inertia by the parallel-axis
theorem — so the T1 trunk absorbs head/arms/waist mass exactly as PhysX does
(cross-checked against the merged trunk inertial in
resources/T1/T1_locomotion.xml).

Collision geometry is reduced to per-body sample-point sets (box corners,
cylinder cap rims, sphere centers with radius) — the static contact
candidates the heightfield contact kernel tests every substep.  This is a
deliberate TPU-first design: fixed-size point sets instead of a dynamic
broadphase, so contact is a dense masked computation with static shapes.
"""

import dataclasses
import xml.etree.ElementTree as ET

import numpy as np

CYLINDER_RIM_POINTS = 6


def _rpy_matrix(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _origin(elem):
    """(pos, R) from a URDF <origin> child (identity if absent)."""
    if elem is None:
        return np.zeros(3), np.eye(3)
    o = elem.find("origin")
    if o is None:
        return np.zeros(3), np.eye(3)
    xyz = np.array([float(v) for v in o.get("xyz", "0 0 0").split()])
    rpy = [float(v) for v in o.get("rpy", "0 0 0").split()]
    return xyz, _rpy_matrix(*rpy)


@dataclasses.dataclass
class _Link:
    name: str
    mass: float
    com: np.ndarray          # body frame
    inertia: np.ndarray      # 3x3 about com, body frame
    shapes: list             # list of (kind, pos, R, params)


@dataclasses.dataclass
class _Joint:
    name: str
    kind: str
    parent: str
    child: str
    pos: np.ndarray
    rot: np.ndarray
    axis: np.ndarray
    lower: float
    upper: float
    effort: float
    velocity: float


@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Static robot description. Body 0 is the floating base; every other
    body has exactly one revolute joint, so dof j drives body j + 1."""

    body_names: tuple
    dof_names: tuple
    parent: np.ndarray       # [nb] movable-parent index, -1 for base
    joint_pos: np.ndarray    # [nb, 3] joint origin in parent body frame
    joint_rot: np.ndarray    # [nb, 3, 3] child frame rotation at q=0
    joint_axis: np.ndarray   # [nb, 3] axis in child body frame
    body_mass: np.ndarray    # [nb]
    body_com: np.ndarray     # [nb, 3] body frame
    body_inertia: np.ndarray  # [nb, 3, 3] about com, body frame
    dof_lower: np.ndarray    # [nd]
    dof_upper: np.ndarray    # [nd]
    dof_vel_limit: np.ndarray  # [nd]
    dof_effort: np.ndarray   # [nd]
    # collision sample points
    point_body: np.ndarray   # [npt] body index
    point_pos: np.ndarray    # [npt, 3] body frame
    point_radius: np.ndarray  # [npt]
    point_shape: np.ndarray  # [npt] shape index
    shape_body: np.ndarray   # [ns] body index per collision shape

    @property
    def num_bodies(self):
        return len(self.body_names)

    @property
    def num_dofs(self):
        return len(self.dof_names)

    @property
    def num_points(self):
        return len(self.point_body)

    def body_index(self, name):
        return self.body_names.index(name)

    def shape_indices_of_body(self, body_idx):
        return [i for i, b in enumerate(self.shape_body) if b == body_idx]


def _parse_inertial(link_elem):
    inertial = link_elem.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    pos, R = _origin(inertial)
    mass = float(inertial.find("mass").get("value"))
    ie = inertial.find("inertia")
    ixx, iyy, izz = (float(ie.get(k)) for k in ("ixx", "iyy", "izz"))
    ixy, ixz, iyz = (float(ie.get(k, "0")) for k in ("ixy", "ixz", "iyz"))
    I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    # rotate inertia from the inertial frame into the link frame
    return mass, pos, R @ I @ R.T


def _parse_shapes(link_elem):
    shapes = []
    for col in link_elem.findall("collision"):
        pos, R = _origin(col)
        geom = col.find("geometry")
        if geom is None:
            continue
        box = geom.find("box")
        cyl = geom.find("cylinder")
        sph = geom.find("sphere")
        if box is not None:
            size = np.array([float(v) for v in box.get("size").split()])
            shapes.append(("box", pos, R, size))
        elif cyl is not None:
            shapes.append(
                ("cylinder", pos, R,
                 np.array([float(cyl.get("radius")), float(cyl.get("length"))]))
            )
        elif sph is not None:
            shapes.append(("sphere", pos, R, np.array([float(sph.get("radius"))])))
        # meshes are ignored as contact sources (the reference's locomotion
        # asset uses primitive proxies for all contacting bodies)
    return shapes


def _shape_points(kind, pos, R, params, rim_points=CYLINDER_RIM_POINTS):
    """Sample points (in body frame) + per-point radius for one shape."""
    if kind == "box":
        sx, sy, sz = params / 2.0
        corners = np.array(
            [[sx * a, sy * b, sz * c] for a in (-1, 1) for b in (-1, 1) for c in (-1, 1)]
        )
        pts = pos + corners @ R.T
        return pts, np.zeros(len(pts))
    if kind == "cylinder":
        r, length = params
        angles = 2 * np.pi * np.arange(rim_points) / rim_points
        ring = np.stack([r * np.cos(angles), r * np.sin(angles), np.zeros_like(angles)], axis=-1)
        pts = np.concatenate([ring + [0, 0, length / 2], ring + [0, 0, -length / 2]])
        pts = pos + pts @ R.T
        return pts, np.zeros(len(pts))
    if kind == "sphere":
        return pos[None, :], np.array([params[0]])
    raise ValueError(kind)


def load_urdf(path, cylinder_rim_points=CYLINDER_RIM_POINTS):
    """Parse a URDF into a RobotModel with fixed joints collapsed.

    cylinder_rim_points sets the contact-sample density of cylinder cap
    rims (asset.cylinder_rim_points in task configs).  The contact solve's
    VPU cost scales with the total point count; 4 rim points (vs the
    historical 6) drop the walk model from 72 to 56 points while keeping
    the same cap-circle coverage the solver sweeps actually use."""
    root = ET.parse(path).getroot()

    links = {}
    for le in root.findall("link"):
        mass, com, inertia = _parse_inertial(le)
        links[le.get("name")] = _Link(le.get("name"), mass, com, inertia, _parse_shapes(le))

    joints = []
    child_of = {}
    for je in root.findall("joint"):
        pos, R = _origin(je)
        axis_elem = je.find("axis")
        axis = (
            np.array([float(v) for v in axis_elem.get("xyz").split()])
            if axis_elem is not None
            else np.array([1.0, 0.0, 0.0])
        )
        limit = je.find("limit")
        j = _Joint(
            name=je.get("name"),
            kind=je.get("type"),
            parent=je.find("parent").get("link"),
            child=je.find("child").get("link"),
            pos=pos,
            rot=R,
            axis=axis,
            lower=float(limit.get("lower", "0")) if limit is not None else 0.0,
            upper=float(limit.get("upper", "0")) if limit is not None else 0.0,
            effort=float(limit.get("effort", "0")) if limit is not None else 0.0,
            velocity=float(limit.get("velocity", "0")) if limit is not None else 0.0,
        )
        joints.append(j)
        child_of[j.child] = j

    root_link = next(name for name in links if name not in child_of)

    # --- collapse fixed joints: movable bodies are the root + revolute children
    movable = [root_link]
    for j in joints:
        if j.kind != "fixed":
            if j.kind != "revolute" and j.kind != "continuous":
                raise NotImplementedError(f"joint type {j.kind}")
            movable.append(j.child)

    def fixed_transform_to_movable(link_name):
        """(movable ancestor name, pos, R) of link frame in that ancestor."""
        pos, R = np.zeros(3), np.eye(3)
        name = link_name
        while name != root_link and name in child_of and child_of[name].kind == "fixed":
            j = child_of[name]
            pos = j.pos + j.rot @ pos
            R = j.rot @ R
            name = j.parent
        return name, pos, R

    # accumulate inertia + shapes of fixed links into their movable ancestor
    merged = {name: {"mass": 0.0, "moment": np.zeros(3), "inertia": np.zeros((3, 3)), "shapes": []}
              for name in movable}
    for name, link in links.items():
        anc, pos, R = fixed_transform_to_movable(name)
        if anc not in merged:
            # fixed chain hanging under a movable link that itself hangs under
            # a fixed chain cannot occur here; guard anyway
            raise RuntimeError(f"link {name} collapsed into non-movable {anc}")
        com_anc = pos + R @ link.com
        m = link.mass
        acc = merged[anc]
        acc["mass"] += m
        acc["moment"] += m * com_anc
        # rotate inertia to ancestor axes; shift to ancestor origin (parallel axis)
        I_rot = R @ link.inertia @ R.T
        cx = np.array(
            [[0, -com_anc[2], com_anc[1]], [com_anc[2], 0, -com_anc[0]], [-com_anc[1], com_anc[0], 0]]
        )
        acc["inertia"] += I_rot - m * (cx @ cx)  # inertia about ancestor origin
        for kind, spos, sR, params in link.shapes:
            acc["shapes"].append((kind, pos + R @ spos, R @ sR, params))

    # reorder movable bodies so parents precede children (root first,
    # then joints in URDF document order — matches Isaac Gym/MuJoCo ordering)
    body_names = [root_link] + [j.child for j in joints if j.kind != "fixed"]
    body_idx = {n: i for i, n in enumerate(body_names)}

    nb = len(body_names)
    parent = np.full(nb, -1, dtype=np.int32)
    joint_pos = np.zeros((nb, 3))
    joint_rot = np.tile(np.eye(3), (nb, 1, 1))
    joint_axis = np.zeros((nb, 3))
    dof_names = []
    dof_lims = []

    for j in joints:
        if j.kind == "fixed":
            continue
        ci = body_idx[j.child]
        anc, pos, R = fixed_transform_to_movable(j.parent)
        parent[ci] = body_idx[anc]
        joint_pos[ci] = pos + R @ j.pos
        joint_rot[ci] = R @ j.rot
        joint_axis[ci] = j.axis
        dof_names.append(j.name)
        dof_lims.append((j.lower, j.upper, j.velocity, j.effort))
    assert all(parent[i] < i for i in range(1, nb)), "bodies must be topologically ordered"

    body_mass = np.zeros(nb)
    body_com = np.zeros((nb, 3))
    body_inertia = np.zeros((nb, 3, 3))
    point_body, point_pos, point_radius, point_shape, shape_body = [], [], [], [], []
    shape_count = 0
    for i, name in enumerate(body_names):
        acc = merged[name]
        m = acc["mass"]
        com = acc["moment"] / m if m > 0 else np.zeros(3)
        cx = np.array([[0, -com[2], com[1]], [com[2], 0, -com[0]], [-com[1], com[0], 0]])
        body_mass[i] = m
        body_com[i] = com
        # inertia about com from inertia about body origin
        body_inertia[i] = acc["inertia"] + m * (cx @ cx)
        for kind, spos, sR, params in acc["shapes"]:
            pts, radii = _shape_points(kind, spos, sR, params,
                                       rim_points=cylinder_rim_points)
            point_body.extend([i] * len(pts))
            point_pos.append(pts)
            point_radius.append(radii)
            point_shape.extend([shape_count] * len(pts))
            shape_body.append(i)
            shape_count += 1

    dof_lims = np.array(dof_lims)
    return RobotModel(
        body_names=tuple(body_names),
        dof_names=tuple(dof_names),
        parent=parent,
        joint_pos=joint_pos,
        joint_rot=joint_rot,
        joint_axis=joint_axis,
        body_mass=body_mass,
        body_com=body_com,
        body_inertia=body_inertia,
        dof_lower=dof_lims[:, 0],
        dof_upper=dof_lims[:, 1],
        dof_vel_limit=dof_lims[:, 2],
        dof_effort=dof_lims[:, 3],
        point_body=np.array(point_body, dtype=np.int32),
        point_pos=np.concatenate(point_pos),
        point_radius=np.concatenate(point_radius),
        point_shape=np.array(point_shape, dtype=np.int32),
        shape_body=np.array(shape_body, dtype=np.int32),
    )
