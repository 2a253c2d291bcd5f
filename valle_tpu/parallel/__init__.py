from valle_tpu.parallel import dist, mesh
from valle_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch
