"""Pure, single-process kernels shared by the oracle and the Ray stages.

These are the "inner loops" — the distributed machinery around them is what
the equivalence tests compare (like PyReshaper's serial mode vs MPI mode
running the same read/write code, checked by ``reshaperTests``).
"""
