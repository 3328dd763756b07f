from .centroidal_id import CentroidalID
from .kinodynamics_id import IDSettings, KinodynamicsID
from .qp import QPSolution, solve_qp

__all__ = ["CentroidalID", "IDSettings", "KinodynamicsID", "QPSolution", "solve_qp"]
