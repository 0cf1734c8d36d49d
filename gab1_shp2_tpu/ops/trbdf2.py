"""Stiff TRBDF2 integrator (placeholder — implemented in a later commit)."""


def solve_stiff(*args, **kwargs):
    raise NotImplementedError("TRBDF2 path lands in the next milestone")
