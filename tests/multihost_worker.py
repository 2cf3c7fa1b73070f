"""One process of the 2-process multi-host test (tests/test_multihost.py).

Runs the engine over a hybrid DCN x ICI mesh (parallel/multihost.py) where the
"DCN" axis is a real process boundary (JAX's gloo cross-process transport on
CPU), and asserts outputs equal a process-local single-device run.  This is
the fake-multihost strategy of SURVEY.md §7 M6 taken one step further than the
single-process 8-device mesh tests: collectives genuinely cross processes.

Usage (spawned by the test): multihost_worker.py <pid> <nproc> <port>
Requires env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env alone is too late (CLAUDE.md)

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"localhost:{PORT}", num_processes=NPROC,
                           process_id=PID)
jax.config.update("jax_default_matmul_precision", "float32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from magicdec_tpu.config import tiny_config  # noqa: E402
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine  # noqa: E402
from magicdec_tpu.parallel import multihost as MH  # noqa: E402
from tests.test_spec_parity import _random_params  # noqa: E402

CFG = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=4, dim=64,
                  intermediate_size=128)
ECFG = EngineConfig(mode="streamingllm", gamma=3, draft_budget=33,
                    max_seq_len=256, chunk_size=16, window_size=8, sink_size=4,
                    max_gen=16, eot_ids=(-1,), cache_dtype=jnp.float32)
B, PREFIX = 8, 48


def replicate(mesh, x):
    """Gather a sharded array to a fully-replicated host value (the DCN-side
    equivalent of the reference's dist.broadcast readout)."""
    rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep.addressable_data(0))


def main():
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == 4 * NPROC, jax.device_count()

    params = _random_params(CFG, seed=5)
    rng = np.random.RandomState(0)
    prompt_np = rng.randint(0, CFG.vocab_size, size=(B, PREFIX)).astype(np.int32)

    # golden: process-local single-device run (identical on every process)
    ref = SpecEngine(params, CFG, ECFG)
    st = ref.encode(jnp.asarray(prompt_np))
    _, ref_stats = ref.generate(st)
    ref_out = np.asarray(ref_stats["output"])
    ref_n = np.asarray(ref_stats["num_committed"])

    # distributed: data axis 4 spans the process boundary, model axis 2 stays
    # inside each process (make_hybrid_mesh's DCN-major layout)
    mesh = MH.make_hybrid_mesh(model_axis=2)
    assert mesh.shape == {"data": 4, "model": 2}
    eng = SpecEngine(params, CFG, ECFG, mesh=mesh)
    psh = NamedSharding(mesh, P("data", None))
    prompt = jax.make_array_from_callback(prompt_np.shape, psh,
                                          lambda idx: prompt_np[idx])
    st = eng.encode(prompt)
    _, stats = eng.generate(st)

    np.testing.assert_array_equal(replicate(mesh, stats["output"]), ref_out)
    np.testing.assert_array_equal(replicate(mesh, stats["num_committed"]), ref_n)

    # baseline path over the same mesh
    stb = eng.encode_baseline(prompt)
    _, bstats = eng.generate_baseline(stb, max_new=12)
    stb_ref = ref.encode_baseline(jnp.asarray(prompt_np))
    _, bref = ref.generate_baseline(stb_ref, max_new=12)
    np.testing.assert_array_equal(replicate(mesh, bstats["output"]),
                                  np.asarray(bref["output"]))

    print(f"MULTIHOST_OK pid={PID}", flush=True)


if __name__ == "__main__":
    main()
