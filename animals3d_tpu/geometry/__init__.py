from animals3d_tpu.geometry import tets
from animals3d_tpu.geometry.mesh import Mesh, make_mesh
