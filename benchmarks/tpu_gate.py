#!/usr/bin/env python
"""Tunnel-liveness gate for measurement queues.

The axon tunnel intermittently wedges: a client started in the bad
window blocks forever inside backend init (no CPU, no output). Queue
scripts run this gate (under an external ``timeout``) before each arm;
rc 0 means one trivial jitted op round-tripped the device."""
import jax
import jax.numpy as jnp

print(float(jax.jit(lambda x: x + 1.0)(jnp.float32(1))), flush=True)
