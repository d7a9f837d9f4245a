#!/bin/bash
# wait for TPU health, then run probe4 with given res/chunk
for i in $(seq 1 12); do
  R=$(timeout 60 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>/dev/null | tail -1)
  if [ "$R" = "512.0" ]; then echo "healthy after $i"; break; fi
  sleep 30
done
timeout 500 python probe4.py $1 $2 2>&1 | tail -2
