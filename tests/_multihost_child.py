"""Child process for the 2-process jax.distributed test (test_multihost.py).

Usage: python _multihost_child.py <coordinator> <num_processes> <process_id>
Prints 'MULTIHOST_OK <pid> <gathered>' on success.
"""
import sys

import numpy as np


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    sys.path.insert(0, sys.argv[4])  # repo root

    from visualdet3d_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator, num_processes, process_id)

    import jax
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.process_index() == process_id
    # one CPU device per process -> the global mesh spans both hosts
    assert jax.device_count() == num_processes, jax.device_count()

    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.array([float(process_id + 1)]))
    np.testing.assert_allclose(
        np.asarray(gathered).ravel(),
        np.arange(1, num_processes + 1, dtype=np.float64))

    # a psum over the cross-host 'data' mesh — the gradient all-reduce path
    from visualdet3d_tpu.parallel import mesh as mesh_lib
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = mesh_lib.make_mesh()
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data')),
        np.full((1, 4), float(process_id + 1), np.float32),
        (num_processes, 4))
    total = jax.jit(lambda a: a.sum(),
                    out_shardings=NamedSharding(mesh, P()))(x)
    np.testing.assert_allclose(
        float(total), 4.0 * sum(range(1, num_processes + 1)))

    print(f'MULTIHOST_OK {process_id} {np.asarray(gathered).ravel().tolist()}',
          flush=True)


if __name__ == '__main__':
    main()
