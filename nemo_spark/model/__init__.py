from nemo_spark.model.rules import Var, Atom, Rule, Program, Aggregate, agg

__all__ = ["Var", "Atom", "Rule", "Program", "Aggregate", "agg"]
