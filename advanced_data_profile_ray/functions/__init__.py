"""Pure, vectorized kernels used inside ``map_batches`` bodies and at
finalize time on the driver. No Ray imports here."""
