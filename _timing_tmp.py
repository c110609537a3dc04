import os, time, faulthandler, sys
faulthandler.dump_traceback_later(90, repeat=True, file=sys.stderr)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
t0 = time.time()
from miden_tpu.precompile.ec import EcAddClaim
from miden_tpu.precompile.session import prove_deferred_state, build_session_traces, verify_deferred
from miden_tpu.stark.params import TEST_PARAMS
from miden_tpu.dsa.ecdsa_k256 import _point_mul
G, G2 = _point_mul(1), _point_mul(2)
print("imports", time.time()-t0, flush=True)
t1 = time.time()
tr = build_session_traces([EcAddClaim(a=G, b=G2)])
print("traces", time.time()-t1, flush=True)
t1 = time.time()
proof = prove_deferred_state([EcAddClaim(a=G, b=G2)], params=TEST_PARAMS)
print("prove", time.time()-t1, flush=True)
t1 = time.time()
verify_deferred(proof, proof.root, params=TEST_PARAMS)
print("verify", time.time()-t1, flush=True)
