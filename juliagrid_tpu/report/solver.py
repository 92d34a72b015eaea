"""Solver progress printing (reference print/solver.jl:2-481, verbose 0-3)."""

from __future__ import annotations


def print_title(name: str, verbose: int):
    if verbose >= 1:
        pretty = name.replace("_", " ").title()
        print(f"{pretty} Solver")


def print_iteration(it: int, del_p: float, del_q: float, verbose: int):
    if verbose >= 2:
        print(f"  iteration {it}: max|dP| = {del_p:.4e}, max|dQ| = {del_q:.4e}")


def print_exit(converged: bool, it: int, verbose: int):
    if verbose >= 1:
        if converged:
            print(f"EXIT: The solution was found in {it} iterations.")
        else:
            print(f"EXIT: The maximum number of iterations ({it}) was reached.")
