"""Process-control layer (SURVEY §2.11): config cascade, validation,
start gating, retry state machine, processed-file ledger — the
reference's orchestration verbs re-expressed as plain Python around
lazy DataFrame plans.
"""
