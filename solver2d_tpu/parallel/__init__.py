from .batch import batch_states, batched_step, replicate_state  # noqa: F401
from .sharding import make_mesh, shard_state, sharded_step  # noqa: F401
