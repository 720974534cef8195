from cht_sync_spark.operators.lww import lww_dedup, lww_order_cols
from cht_sync_spark.operators.contracts import ContractViolation, check_contract, contract_report

__all__ = ["lww_dedup", "lww_order_cols", "ContractViolation", "check_contract", "contract_report"]
