from animals3d_tpu.parallel.mesh import (get_mesh, replicate, shard_batch)
