"""Generate robot URDF assets (Go2, Solo12, Talos-reduced).

The sandbox has no example-robot-data, so the framework ships its own
robot descriptions with realistic kinematic layouts and plausible inertial
parameters (public spec sheets, approximate).  Frame/joint naming follows
the reference examples (FL_foot..., FR_FOOT..., left_sole_link) so configs
carry over verbatim (reference: examples/go2_kinodynamics.py:23-27,
tests/test_utils.cpp:70-94).

Run: python tools/gen_assets.py  (writes simple_mpc_tpu/models/assets/*.urdf)
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "simple_mpc_tpu", "models", "assets")


def link(name, m, com, ixx, iyy, izz, ixy=0.0, ixz=0.0, iyz=0.0):
    return f"""  <link name="{name}">
    <inertial>
      <origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>
      <mass value="{m}"/>
      <inertia ixx="{ixx}" ixy="{ixy}" ixz="{ixz}" iyy="{iyy}" iyz="{iyz}" izz="{izz}"/>
    </inertial>
  </link>
"""


def empty_link(name):
    return f"""  <link name="{name}">
    <inertial>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <mass value="0.001"/>
      <inertia ixx="1e-7" ixy="0" ixz="0" iyy="1e-7" iyz="0" izz="1e-7"/>
    </inertial>
  </link>
"""


def joint(name, jtype, parent, child, xyz, axis=None, lower=None, upper=None,
          effort=None, velocity=None, damping=0.01, friction=0.1, rpy=(0, 0, 0)):
    s = f"""  <joint name="{name}" type="{jtype}">
    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>
    <parent link="{parent}"/>
    <child link="{child}"/>
"""
    if axis is not None:
        s += f'    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>\n'
    if jtype != "fixed":
        s += (f'    <limit lower="{lower}" upper="{upper}" effort="{effort}" '
              f'velocity="{velocity}"/>\n')
        s += f'    <dynamics damping="{damping}" friction="{friction}"/>\n'
    s += "  </joint>\n"
    return s


def gen_go2():
    """Unitree Go2 quadruped: 12 revolute joints, point feet."""
    u = '<?xml version="1.0"?>\n<robot name="go2">\n'
    u += link("base", 6.921, (0.0223, 0.002, -0.0005), 0.02448, 0.098077, 0.107, 0.00012, 0.00188, -0.00002)
    legs = {"FL": (0.1934, 0.0465), "FR": (0.1934, -0.0465),
            "RL": (-0.1934, 0.0465), "RR": (-0.1934, -0.0465)}
    for leg, (x, y) in legs.items():
        side = 1.0 if "L" in leg[1] else -1.0
        u += link(f"{leg}_hip", 0.678, (-0.0054, side * 0.0194, 0.0), 0.00048, 0.000884, 0.000596)
        u += link(f"{leg}_thigh", 1.152, (-0.00374, side * -0.0223, -0.0327), 0.00584, 0.0058, 0.00103)
        u += link(f"{leg}_calf", 0.154, (0.00548, -0.000975, -0.115), 0.00108, 0.0011, 0.0000335)
        u += empty_link(f"{leg}_foot")
        u += joint(f"{leg}_hip_joint", "revolute", "base", f"{leg}_hip", (x, y, 0),
                   axis=(1, 0, 0), lower=-1.0472, upper=1.0472, effort=23.7, velocity=30.1)
        u += joint(f"{leg}_thigh_joint", "revolute", f"{leg}_hip", f"{leg}_thigh",
                   (0, side * 0.0955, 0), axis=(0, 1, 0), lower=-1.5708, upper=3.4907,
                   effort=23.7, velocity=30.1)
        u += joint(f"{leg}_calf_joint", "revolute", f"{leg}_thigh", f"{leg}_calf",
                   (0, 0, -0.213), axis=(0, 1, 0), lower=-2.7227, upper=-0.83776,
                   effort=45.43, velocity=15.7)
        u += joint(f"{leg}_foot_joint", "fixed", f"{leg}_calf", f"{leg}_foot", (0, 0, -0.213))
    u += "</robot>\n"
    return u


def gen_solo12():
    """ODRI Solo12 quadruped: 12 joints (hip abduction + upper + lower)."""
    u = '<?xml version="1.0"?>\n<robot name="solo12">\n'
    u += link("base_link", 1.16115, (0.0, 0.0, 0.0), 0.00578, 0.01938, 0.02476)
    legs = {"FL": (0.1946, 0.0875), "FR": (0.1946, -0.0875),
            "HL": (-0.1946, 0.0875), "HR": (-0.1946, -0.0875)}
    for leg, (x, y) in legs.items():
        side = 1.0 if leg[1] == "L" else -1.0
        u += link(f"{leg}_SHOULDER", 0.14853, (-0.0789 * (1 if x > 0 else -1), 0.01, 0.0),
                  0.0000842, 0.000199, 0.000185)
        u += link(f"{leg}_UPPER_LEG", 0.14853, (0.0, side * 0.0193, -0.0783),
                  0.000417, 0.000426, 0.0000299)
        u += link(f"{leg}_LOWER_LEG", 0.03070, (0.0, side * 0.0088, -0.1089),
                  0.000127, 0.000128, 0.0000025)
        u += empty_link(f"{leg}_FOOT")
        u += joint(f"{leg}_HAA", "revolute", "base_link", f"{leg}_SHOULDER", (x, y, 0),
                   axis=(1, 0, 0), lower=-2.4, upper=2.4, effort=2.7, velocity=80.0)
        u += joint(f"{leg}_HFE", "revolute", f"{leg}_SHOULDER", f"{leg}_UPPER_LEG",
                   (0, side * 0.014, 0), axis=(0, 1, 0), lower=-3.15, upper=3.15,
                   effort=2.7, velocity=80.0)
        u += joint(f"{leg}_KFE", "revolute", f"{leg}_UPPER_LEG", f"{leg}_LOWER_LEG",
                   (0, side * 0.03745, -0.16), axis=(0, 1, 0), lower=-3.15, upper=3.15,
                   effort=2.7, velocity=80.0)
        u += joint(f"{leg}_ANKLE", "fixed", f"{leg}_LOWER_LEG", f"{leg}_FOOT",
                   (0, side * 0.008, -0.16))
    u += "</robot>\n"
    return u


def gen_talos():
    """Full Talos biped (spec-sheet approximate): 6-DoF legs x2 + 2-DoF
    torso + 7-DoF arms x2 + 1-DoF grippers x2 + 2-DoF head = 32 actuated
    joints, quad (6D-wrench) sole feet.  Joint declaration order matches
    the pinocchio talos_reduced.urdf tree order (legs left, legs right,
    torso, arm left + gripper, arm right + gripper, head) so configuration
    vectors line up with the reference examples
    (reference: tests/test_utils.cpp:27-34, examples/talos_kinodynamics.py:
    49-66).  The reference fixture locks everything after arm_4 via
    buildReducedModel (tests/test_utils.cpp:63) -> 22 actuated joints."""
    # links first (order irrelevant), then joints in tree order
    u = '<?xml version="1.0"?>\n<robot name="talos">\n'
    u += link("base_link", 15.36284, (-0.05709, 0.0, 0.0973), 0.1016, 0.0657, 0.0971)
    u += link("torso_1_link", 2.294658, (0.00078, -0.00069, 0.0222), 0.00419, 0.00296, 0.00323)
    # torso_2 carries the electronics backpack (arms/head are separate now)
    u += link("torso_2_link", 18.80, (-0.04551, -0.00053, 0.2216), 0.570, 0.521, 0.159)
    u += link("head_1_link", 0.65, (0.0, 0.0, 0.02), 0.00122, 0.00093, 0.00109)
    u += link("head_2_link", 1.40, (0.01, 0.0, 0.09), 0.00985, 0.01059, 0.00734)
    for side, sgn in (("left", 1.0), ("right", -1.0)):
        u += link(f"leg_{side}_1_link", 1.845591, (0.02395, 0.00654 * sgn, 0.0611),
                  0.00579, 0.00757, 0.00483)
        u += link(f"leg_{side}_2_link", 1.490952, (-0.00704, -0.00173 * sgn, -0.0282),
                  0.00270, 0.00147, 0.00255)
        u += link(f"leg_{side}_3_link", 6.239871, (-0.00086, 0.00362 * sgn, -0.1305),
                  0.1423, 0.1397, 0.0205)
        u += link(f"leg_{side}_4_link", 3.759951, (0.01316, 0.00344 * sgn, -0.1786),
                  0.0423, 0.0409, 0.00575)
        u += link(f"leg_{side}_5_link", 1.29096, (-0.01476, -0.00173 * sgn, 0.01399),
                  0.00118, 0.00073, 0.00107)
        u += link(f"leg_{side}_6_link", 1.58062, (0.02026, -0.00061 * sgn, -0.0794),
                  0.00514, 0.00812, 0.00481)
        u += empty_link(f"{side}_sole_link")
        u += link(f"arm_{side}_1_link", 2.10, (-0.002, sgn * 0.059, -0.012),
                  0.00499, 0.00417, 0.00357)
        u += link(f"arm_{side}_2_link", 2.20, (0.009, sgn * 0.012, -0.075),
                  0.00837, 0.00879, 0.00300)
        u += link(f"arm_{side}_3_link", 2.20, (0.005, sgn * -0.002, -0.112),
                  0.00964, 0.00970, 0.00233)
        u += link(f"arm_{side}_4_link", 1.10, (-0.005, sgn * 0.001, -0.086),
                  0.00297, 0.00295, 0.00086)
        u += link(f"arm_{side}_5_link", 1.00, (0.0, sgn * 0.001, -0.066),
                  0.00152, 0.00150, 0.00057)
        u += link(f"arm_{side}_6_link", 0.60, (0.0, 0.0, -0.029),
                  0.00030, 0.00030, 0.00022)
        u += link(f"arm_{side}_7_link", 0.25, (0.006, 0.0, -0.024),
                  0.00011, 0.00010, 0.00008)
        u += link(f"gripper_{side}_link", 0.70, (0.0, 0.0, -0.060),
                  0.00138, 0.00122, 0.00052)
    # joints in pinocchio tree order: legs L, legs R, torso, arm L, arm R, head
    for side, sgn in (("left", 1.0), ("right", -1.0)):
        y = sgn * 0.085
        u += joint(f"leg_{side}_1_joint", "revolute", "base_link", f"leg_{side}_1_link",
                   (-0.02, y, -0.13), axis=(0, 0, 1), lower=-0.349066, upper=1.5708,
                   effort=100.0, velocity=3.87)
        u += joint(f"leg_{side}_2_joint", "revolute", f"leg_{side}_1_link",
                   f"leg_{side}_2_link", (0, 0, 0), axis=(1, 0, 0),
                   lower=-0.5236, upper=0.5236, effort=160.0, velocity=5.8)
        u += joint(f"leg_{side}_3_joint", "revolute", f"leg_{side}_2_link",
                   f"leg_{side}_3_link", (0, 0, 0), axis=(0, 1, 0),
                   lower=-2.095, upper=0.7, effort=160.0, velocity=5.8)
        u += joint(f"leg_{side}_4_joint", "revolute", f"leg_{side}_3_link",
                   f"leg_{side}_4_link", (0, 0, -0.38), axis=(0, 1, 0),
                   lower=0.0, upper=2.618, effort=300.0, velocity=7.0)
        u += joint(f"leg_{side}_5_joint", "revolute", f"leg_{side}_4_link",
                   f"leg_{side}_5_link", (0, 0, -0.325), axis=(0, 1, 0),
                   lower=-1.27, upper=0.68, effort=160.0, velocity=5.8)
        u += joint(f"leg_{side}_6_joint", "revolute", f"leg_{side}_5_link",
                   f"leg_{side}_6_link", (0, 0, 0), axis=(1, 0, 0),
                   lower=-0.5236, upper=0.5236, effort=100.0, velocity=4.8)
        u += joint(f"leg_{side}_sole_fix_joint", "fixed", f"leg_{side}_6_link",
                   f"{side}_sole_link", (0, 0, -0.107))
    u += joint("torso_1_joint", "revolute", "base_link", "torso_1_link", (0, 0, 0.0722),
               axis=(0, 0, 1), lower=-1.308, upper=1.308, effort=78.0, velocity=5.4)
    u += joint("torso_2_joint", "revolute", "torso_1_link", "torso_2_link", (0, 0, 0),
               axis=(0, 1, 0), lower=-0.262, upper=0.785, effort=78.0, velocity=5.4)
    for side, sgn in (("left", 1.0), ("right", -1.0)):
        # 7-DoF arm: shoulder z/x/z, elbow y, forearm z, wrist x/y
        lo1, up1 = (-1.57, 0.52) if side == "left" else (-0.52, 1.57)
        lo2, up2 = (0.0, 2.87) if side == "left" else (-2.87, 0.0)
        u += joint(f"arm_{side}_1_joint", "revolute", "torso_2_link",
                   f"arm_{side}_1_link", (0.0, sgn * 0.1575, 0.2325),
                   axis=(0, 0, 1), lower=lo1, upper=up1, effort=44.64, velocity=2.7)
        u += joint(f"arm_{side}_2_joint", "revolute", f"arm_{side}_1_link",
                   f"arm_{side}_2_link", (0.0, sgn * 0.00493, -0.017),
                   axis=(1, 0, 0), lower=lo2, upper=up2, effort=44.64, velocity=3.66)
        u += joint(f"arm_{side}_3_joint", "revolute", f"arm_{side}_2_link",
                   f"arm_{side}_3_link", (0.0, 0.0, -0.1), axis=(0, 0, 1),
                   lower=-2.42, upper=2.42, effort=17.86, velocity=4.58)
        u += joint(f"arm_{side}_4_joint", "revolute", f"arm_{side}_3_link",
                   f"arm_{side}_4_link", (0.0, sgn * 0.02, -0.17), axis=(0, 1, 0),
                   lower=-2.23, upper=0.0, effort=17.86, velocity=4.58)
        u += joint(f"arm_{side}_5_joint", "revolute", f"arm_{side}_4_link",
                   f"arm_{side}_5_link", (0.0, 0.0, -0.16), axis=(0, 0, 1),
                   lower=-2.51, upper=2.51, effort=3.0, velocity=1.95)
        u += joint(f"arm_{side}_6_joint", "revolute", f"arm_{side}_5_link",
                   f"arm_{side}_6_link", (0.0, 0.0, -0.1), axis=(1, 0, 0),
                   lower=-1.37, upper=1.37, effort=6.6, velocity=1.76)
        u += joint(f"arm_{side}_7_joint", "revolute", f"arm_{side}_6_link",
                   f"arm_{side}_7_link", (0.0, 0.0, -0.07), axis=(0, 1, 0),
                   lower=-0.68, upper=0.68, effort=6.6, velocity=1.76)
        u += joint(f"gripper_{side}_joint", "revolute", f"arm_{side}_7_link",
                   f"gripper_{side}_link", (0.0, 0.0, -0.07), axis=(1, 0, 0),
                   lower=-0.96, upper=0.0, effort=10.0, velocity=1.0)
    u += joint("head_1_joint", "revolute", "torso_2_link", "head_1_link",
               (0.0, 0.0, 0.32), axis=(0, 1, 0), lower=-0.21, upper=0.79,
               effort=8.0, velocity=3.0)
    u += joint("head_2_joint", "revolute", "head_1_link", "head_2_link",
               (0.0, 0.0, 0.1), axis=(0, 0, 1), lower=-1.31, upper=1.31,
               effort=4.0, velocity=3.0)
    u += "</robot>\n"
    return u


def gen_talos_srdf():
    """Talos SRDF: the half_sitting reference configuration + rotor
    parameters, mirroring what the reference loads from talos_data/srdf
    (tests/test_utils.cpp:22-24).  Values follow the public talos
    half-sitting posture; rotor inertia/gear-ratio figures are spec-sheet
    approximate."""
    s = '<?xml version="1.0"?>\n<robot name="talos">\n'
    s += '  <group_state name="half_sitting" group="all">\n'
    s += '    <joint name="root_joint" value="0 0 1.01 0 0 0 1"/>\n'
    leg = [0.0, 0.0, -0.411354, 0.859395, -0.448041, -0.001708]
    for side in ("left", "right"):
        for i, v in enumerate(leg):
            s += f'    <joint name="leg_{side}_{i+1}_joint" value="{v}"/>\n'
    s += '    <joint name="torso_1_joint" value="0"/>\n'
    s += '    <joint name="torso_2_joint" value="0.006761"/>\n'
    arm = [0.0, 0.25847, 0.173046, -0.525366, 0.0, 0.0, 0.1]
    for side, sgn in (("left", 1.0), ("right", -1.0)):
        for i, v in enumerate(arm):
            s += (f'    <joint name="arm_{side}_{i+1}_joint" '
                  f'value="{sgn * v if i in (1, 2) else v}"/>\n')
        s += f'    <joint name="gripper_{side}_joint" value="0"/>\n'
    s += '    <joint name="head_1_joint" value="0"/>\n'
    s += '    <joint name="head_2_joint" value="0"/>\n'
    s += '  </group_state>\n'
    s += '  <rotor_params>\n'
    groups = ([(f"leg_{side}_{i}_joint", 1.39e-4, 100.0)
               for side in ("left", "right") for i in range(1, 7)]
              + [("torso_1_joint", 1.39e-4, 100.0),
                 ("torso_2_joint", 1.39e-4, 100.0)]
              + [(f"arm_{side}_{i}_joint", 1.39e-4, 100.0)
                 for side in ("left", "right") for i in range(1, 5)]
              + [(f"arm_{side}_{i}_joint", 3.0e-5, 160.0)
                 for side in ("left", "right") for i in range(5, 8)])
    for name, m, gr in groups:
        s += f'    <joint name="{name}" mass="{m}" gear_ratio="{gr}"/>\n'
    s += '  </rotor_params>\n'
    s += "</robot>\n"
    return s


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    for fname, gen in (("go2.urdf", gen_go2), ("solo12.urdf", gen_solo12),
                       ("talos.urdf", gen_talos),
                       ("talos.srdf", gen_talos_srdf)):
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(gen())
        print("wrote", fname)
