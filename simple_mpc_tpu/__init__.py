"""simple_mpc_tpu — TPU-native whole-body locomotion MPC framework.

Re-implements the capabilities of Simple-Robotics/simple-mpc (receding-
horizon whole-body MPC for legged robots: centroidal / kinodynamics /
full-dynamics OCPs, ProxDDP solver, 1 kHz inverse-dynamics layer, swing
trajectories, interpolation, friction compensation) as a JAX/XLA-first
design: pure functions over fixed-shape arrays, batched and shardable.
"""
__version__ = "0.1.0"

from . import configs, models, ocp, ops, parallel, solver, utils  # noqa: F401
from .id import CentroidalID, IDSettings, KinodynamicsID  # noqa: F401
from .models.handler import RobotDataHandler, RobotModelHandler  # noqa: F401
from .mpc import MPC, FootTrajectory, MPCSettings  # noqa: F401
from .ocp.centroidal import CentroidalOCP  # noqa: F401
from .ocp.fulldynamics import FullDynamicsOCP  # noqa: F401
from .ocp.kinodynamics import KinodynamicsOCP  # noqa: F401
from .solver.proxddp import ProxDDPSolver, Results, SolverSettings  # noqa: F401
from .utils import FrictionCompensation, Interpolator  # noqa: F401
