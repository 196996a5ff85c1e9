"""Problem drivers (layer 6 of the reference architecture).

Each driver mirrors one of the reference's tests/applications drivers
(tests/*.cc): build mesh + boundary conditions, instantiate a solver,
run the time loop, print the deterministic screen output that the golden
tests compare."""
