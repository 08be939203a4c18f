from pigs_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from pigs_tpu.parallel.sharded import eval_mixture_sharded, eval_mixture_ring

__all__ = ["make_mesh", "data_sharding", "replicated", "eval_mixture_sharded", "eval_mixture_ring"]
