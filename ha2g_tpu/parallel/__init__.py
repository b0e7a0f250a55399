from ha2g_tpu.parallel.mesh import (batch_sharding, data_mesh,
                                    replicate, shard_batch)
