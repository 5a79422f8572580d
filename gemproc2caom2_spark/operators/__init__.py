"""Pipeline operators (the visitor analogs).

The reference's extension API is an ordered list of whole-record
transformers ``visit(observation, **kwargs) -> observation``
(/root/reference/gemProc2caom2/composable.py:94-97). Here every
operator is a function ``DataFrame -> DataFrame`` (or a small factory
returning one), kept individually composable so a sub-chain can run on
one url for debugging — the run_single mode
(/root/reference/gemProc2caom2/run_single.py:83-101).
"""
