"""RobotModel -> MJCF exporter.

Serves two roles: (1) ground-truth oracle — MuJoCo recomputes FK/mass
matrix/CoM on the exact same model, validating our kernels; (2) closed-loop
physics validation, replacing the reference's optional PyBullet layer
(reference: examples/bullet_robot.py).
"""
from __future__ import annotations

import numpy as np

from .model import FREE, PRISMATIC, REVOLUTE, RobotModel
from ..ops import lie


def _quat_wxyz(R: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R, dtype=jnp.float64)))
    return np.array([q[3], q[0], q[1], q[2]])


def to_mjcf(model: RobotModel, timestep: float = 0.001, ground: bool = True,
            contact_feet=None, foot_radius: float = 0.015,
            ground_height: float = 0.0) -> str:
    """Emit an MJCF document with identical kinematics/inertials.

    contact_feet: iterable of operational-frame names to equip with a
    collision sphere (radius foot_radius, centered on the frame) so the
    model can be *stepped* as an independent physics plant (the
    reference's PyBullet role, examples/bullet_robot.py:16-120).  The
    floor plane is lowered by foot_radius so contact engages exactly when
    a foot frame reaches z = ground_height.
    """
    contact_feet = set(contact_feet or ())
    children: dict = {}
    for j in range(model.njoints):
        children.setdefault(model.parents[j], []).append(j)

    def fmt(a):
        return " ".join(f"{x:.12g}" for x in np.atleast_1d(np.asarray(a)))

    def body_xml(j: int, indent: str) -> str:
        q = _quat_wxyz(model.jR[j])
        s = f'{indent}<body name="{model.joint_names[j]}_body" pos="{fmt(model.jp[j])}" quat="{fmt(q)}">\n'
        t = model.joint_types[j]
        if t == FREE:
            s += f'{indent}  <freejoint name="{model.joint_names[j]}"/>\n'
        elif t == REVOLUTE:
            s += (f'{indent}  <joint name="{model.joint_names[j]}" type="hinge" '
                  f'axis="{fmt(model.axes[j])}" limited="false"/>\n')
        elif t == PRISMATIC:
            s += (f'{indent}  <joint name="{model.joint_names[j]}" type="slide" '
                  f'axis="{fmt(model.axes[j])}" limited="false"/>\n')
        I = model.inertia[j]
        full = [I[0, 0], I[1, 1], I[2, 2], I[0, 1], I[0, 2], I[1, 2]]
        s += (f'{indent}  <inertial pos="{fmt(model.com[j])}" mass="{model.mass[j]:.12g}" '
              f'fullinertia="{fmt(full)}"/>\n')
        # sites for operational frames attached to this joint
        for f in model.frames:
            if f.parent_joint == j:
                s += (f'{indent}  <site name="{f.name}" pos="{fmt(f.p)}" '
                      f'quat="{fmt(_quat_wxyz(f.R))}" size="0.005"/>\n')
                if f.name in contact_feet:
                    # stiff near-rigid contact (solref ~2 ms) so the plant
                    # behaves like the rigid-contact model being validated
                    s += (f'{indent}  <geom name="{f.name}_collision" '
                          f'type="sphere" size="{foot_radius:.12g}" '
                          f'pos="{fmt(f.p)}" contype="1" conaffinity="1" '
                          f'friction="1 0.005 0.0001" '
                          f'solref="0.002 1"/>\n')
        for c in children.get(j, []):
            s += body_xml(c, indent + "  ")
        s += f"{indent}</body>\n"
        return s

    world = ""
    if ground:
        zf = ground_height - (foot_radius if contact_feet else 0.0)
        world += (f'    <geom name="floor" type="plane" pos="0 0 {zf:.12g}" '
                  'size="10 10 0.1" contype="1" conaffinity="1" '
                  'friction="1 0.005 0.0001"/>\n')
    roots = children.get(-1, [])
    for r in roots:
        world += body_xml(r, "    ")
    return f"""<mujoco model="{model.name}">
  <option timestep="{timestep}" gravity="{fmt(model.gravity)}"/>
  <compiler coordinate="local" inertiafromgeom="false"/>
  <worldbody>
{world}  </worldbody>
</mujoco>
"""
