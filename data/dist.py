"""Shim: the reference's GenerateData default names `data.dist.Hemisphere`
(dataset.py:198) even though the real module is data.distribution — keep the
alias so that (always-overridden) default also resolves here."""
from nerftex_tpu.data.distribution import Hemisphere
