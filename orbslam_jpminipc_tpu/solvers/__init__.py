"""Geometric solvers and optimizers.

RANSAC solvers (two-view H/F initialization, EPnP relocalization, Horn Sim3)
are vmapped over all hypotheses at once — the reference's sequential RANSAC
loops (Initializer.cc:146-169, PnPsolver.cc:154-211, Sim3Solver.cc:158-201)
and its H-vs-F thread race (Initializer.cc:102-107) become single batched
array programs.

LM optimizers (pose-only, local/global Schur BA, Sim3, essential graph)
replace the g2o stack (Thirdparty/g2o) with fixed-shape residual arrays,
analytic Jacobians, and lax.while_loop LM damping.
"""
