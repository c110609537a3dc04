import time
t0=time.time()
from miden_tpu.precompile.ec import EcAddClaim, EcMulClaim
from miden_tpu.precompile.session import prove_deferred_state, verify_deferred
from miden_tpu.stark.params import TEST_PARAMS
from miden_tpu.dsa.ecdsa_k256 import _point_mul
G, G2 = _point_mul(1), _point_mul(2)
claims = [EcAddClaim(a=G, b=G2), EcMulClaim(a=0b1011_0110_1001, b=G)]
t=time.time(); proof = prove_deferred_state(claims, params=TEST_PARAMS)
print("prove_s", round(time.time()-t,2), flush=True)
t=time.time(); verify_deferred(proof, proof.root, params=TEST_PARAMS)
print("verify_s", round(time.time()-t,2), flush=True)
print("EC_SESSION_PROVE_OK n_ec=", proof.n_ec, flush=True)
