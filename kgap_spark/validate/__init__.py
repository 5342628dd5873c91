from kgap_spark.validate.assertions import (  # noqa: F401
    Assertion,
    validate,
    required_property_violations,
    cardinality_violations,
    value_range_violations,
    type_membership_violations,
)
