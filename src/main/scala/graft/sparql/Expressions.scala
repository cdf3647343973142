package graft.sparql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles SPARQL expressions (the FILTER set at reference
  * `handle.rs:4898-4975`) to Catalyst Columns over term-struct columns.
  *
  * Light static typing decides the comparison domain: numeric if either side
  * is numeric, else string if either side is a string expression, else RDF
  * term equality (struct compare). Variables resolve through `R`.
  */
object ExprCompiler {

  /** Resolver over a solution DataFrame: term-struct columns pass through;
    * plain computed columns (aggregate outputs) wrap as literal terms so
    * HAVING/ORDER expressions can reference them uniformly. */
  def resolve(df: org.apache.spark.sql.DataFrame): String => Column = n =>
    if (df.schema(n).dataType.isInstanceOf[StructType]) df(n)
    else struct(lit(Kind.Literal).as("kind"), df(n).cast(StringType).as("value"),
      lit("").as("lang"), lit(Term.XsdDouble).as("datatype"))

  sealed trait Ty
  case object TyNum extends Ty
  case object TyStr extends Ty
  case object TyBool extends Ty
  case object TyTerm extends Ty

  private val NumFns = Set("STRLEN", "ABS", "CEIL", "FLOOR", "ROUND",
    "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "RAND")
  private val StrFns = Set("STR", "UCASE", "LCASE", "CONCAT", "LANG", "DATATYPE",
    "SUBSTR", "REPLACE", "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "TZ", "STRUUID")
  private val TermFns = Set("IRI", "URI", "STRLANG", "STRDT", "NOW", "UUID", "BNODE")

  // ---------------------------------------------------------------------
  // per-query scope for the nondeterministic builtins (SPARQL 1.1 §17.4):
  // NOW() is CONSTANT within one query execution; BNODE(str) maps equal
  // arguments to the same label within a query but not across queries.
  // The engine opens a fresh scope per query; UUID/STRUUID/RAND stay
  // per-row nondeterministic (Spark's uuid()/rand(), evaluated per row).
  // ---------------------------------------------------------------------

  private final case class QueryScope(nowLexical: String, bnodeSalt: String)
  private val scope = new ThreadLocal[QueryScope]

  /** Reset the nondeterministic-builtin scope (engine entry, per query). */
  def newQueryScope(): Unit = scope.remove()

  private def queryScope: QueryScope = {
    if (scope.get == null)
      scope.set(QueryScope(
        java.time.format.DateTimeFormatter.ISO_INSTANT
          .format(java.time.Instant.now()),
        java.util.UUID.randomUUID().toString))
    scope.get
  }

  def infer(e: Expr): Ty = e match {
    case EConst(t) if t.isLiteral && Term.isNumericDatatype(t.datatype) => TyNum
    case EConst(t) if t.isLiteral && t.datatype == Term.XsdBoolean => TyBool
    case EConst(t) if t.isLiteral => TyStr
    case EConst(_) => TyTerm
    case EVar(_) => TyTerm
    case EArith(_, _, _) | ENeg(_) => TyNum
    case EFunc(f, _) if NumFns.contains(f) => TyNum
    case EFunc(f, _) if StrFns.contains(f) => TyStr
    case EFunc(f, _) if TermFns.contains(f) => TyTerm
    case EIf(_, t, _) => infer(t)
    case ECoalesce(args) if args.nonEmpty => infer(args.head)
    case _ => TyBool
  }

  def value(c: Column): Column = c.getField("value")

  def num(e: Expr, R: String => Column): Column = e match {
    case EVar(v) => value(R(v)).cast(DoubleType)
    case EConst(t) => lit(t.value.toDouble)
    case EArith("+", l, r) => num(l, R) + num(r, R)
    case EArith("-", l, r) => num(l, R) - num(r, R)
    case EArith("*", l, r) => num(l, R) * num(r, R)
    case EArith("/", l, r) => num(l, R) / num(r, R)
    case ENeg(x) => -num(x, R)
    case EFunc("STRLEN", Seq(a)) => length(str(a, R)).cast(DoubleType)
    case EFunc("ABS", Seq(a)) => abs(num(a, R))
    case EFunc("CEIL", Seq(a)) => ceil(num(a, R)).cast(DoubleType)
    case EFunc("FLOOR", Seq(a)) => floor(num(a, R)).cast(DoubleType)
    case EFunc("ROUND", Seq(a)) => round(num(a, R), 0)
    // xsd:dateTime accessors over the lexical form (SPARQL 1.1 §17.4.5);
    // SECONDS truncates to the integral part
    case EFunc("YEAR", Seq(a)) => year(ts(a, R)).cast(DoubleType)
    case EFunc("MONTH", Seq(a)) => month(ts(a, R)).cast(DoubleType)
    case EFunc("DAY", Seq(a)) => dayofmonth(ts(a, R)).cast(DoubleType)
    case EFunc("HOURS", Seq(a)) => hour(ts(a, R)).cast(DoubleType)
    case EFunc("MINUTES", Seq(a)) => minute(ts(a, R)).cast(DoubleType)
    case EFunc("SECONDS", Seq(a)) => second(ts(a, R)).cast(DoubleType)
    case EFunc("RAND", Seq()) => rand() // fresh xsd:double per row
    case EIf(c, t, f) => when(toBool(c, R), num(t, R)).otherwise(num(f, R))
    case ECoalesce(args) => coalesce(args.map(num(_, R)): _*)
    case other => throw new SparqlParseException(s"not numeric: $other")
  }

  def str(e: Expr, R: String => Column): Column = e match {
    case EVar(v) => value(R(v))
    case EConst(t) => lit(t.value)
    case EFunc("STR", Seq(a)) => str(a, R)
    case EFunc("UCASE", Seq(a)) => upper(str(a, R))
    case EFunc("LCASE", Seq(a)) => lower(str(a, R))
    case EFunc("CONCAT", args) => concat(args.map(str(_, R)): _*)
    case EFunc("LANG", Seq(EVar(v))) => R(v).getField("lang")
    case EFunc("DATATYPE", Seq(EVar(v))) => R(v).getField("datatype")
    case EFunc("SUBSTR", args) if args.size >= 2 =>
      val start = constNum(args(1)).toInt
      val len = if (args.size >= 3) constNum(args(2)).toInt else Int.MaxValue
      substring(str(args.head, R), start, len)
    case EFunc("REPLACE", Seq(a, p, r)) =>
      regexp_replace(str(a, R), constStr(p), constStr(r))
    // STRBEFORE/STRAFTER with the spec's empty-needle cases (§17.4.3.10-11);
    // constant needle, like REPLACE's pattern
    case EFunc("STRBEFORE", Seq(a, b)) =>
      val needle = constStr(b)
      if (needle.isEmpty) lit("")
      else {
        val s = str(a, R)
        val pos = instr(s, needle)
        when(pos > 0, s.substr(lit(1), pos - 1)).otherwise(lit(""))
      }
    case EFunc("STRAFTER", Seq(a, b)) =>
      val needle = constStr(b)
      val s = str(a, R)
      if (needle.isEmpty) s
      else {
        val pos = instr(s, needle)
        when(pos > 0, s.substr(pos + needle.length, length(s))).otherwise(lit(""))
      }
    // RFC 3986 percent-encoding: url_encode is form-encoding, so re-map
    // '+'→%20, '*'→%2A and un-escape '~' (§17.4.3.12)
    case EFunc("ENCODE_FOR_URI", Seq(a)) =>
      regexp_replace(regexp_replace(regexp_replace(
        url_encode(str(a, R)), "\\+", "%20"), "\\*", "%2A"), "%7E", "~")
    case EFunc("MD5", Seq(a)) => md5(str(a, R))
    case EFunc("SHA1", Seq(a)) => sha1(str(a, R))
    case EFunc("SHA256", Seq(a)) => sha2(str(a, R), 256)
    case EFunc("SHA384", Seq(a)) => sha2(str(a, R), 384)
    case EFunc("SHA512", Seq(a)) => sha2(str(a, R), 512)
    // TZ: the timezone designator of the lexical form, "" when absent
    case EFunc("TZ", Seq(a)) =>
      regexp_extract(str(a, R), "(Z|[+-][0-9]{2}:[0-9]{2})$", 1)
    case EFunc("STRUUID", Seq()) => expr("uuid()") // fresh simple literal per row
    case EFunc("UUID", Seq()) => concat(lit("urn:uuid:"), expr("uuid()"))
    case EFunc("NOW", Seq()) => lit(queryScope.nowLexical) // constant per query
    case EIf(c, t, f) => when(toBool(c, R), str(t, R)).otherwise(str(f, R))
    case ECoalesce(args) => coalesce(args.map(str(_, R)): _*)
    case other => throw new SparqlParseException(s"not a string expression: $other")
  }

  /** lexical form → timestamp (null when unparseable, per try semantics). */
  private def ts(e: Expr, R: String => Column): Column =
    try_to_timestamp(str(e, R))

  private def constStr(e: Expr): String = e match {
    case EConst(t) => t.value
    case other => throw new SparqlParseException(s"constant string required: $other")
  }

  private def constNum(e: Expr): Double = e match {
    case EConst(t) => t.value.toDouble
    case other => throw new SparqlParseException(s"constant number required: $other")
  }

  def toBool(e: Expr, R: String => Column): Column = e match {
    case EOr(l, r) => toBool(l, R) || toBool(r, R)
    case EAnd(l, r) => toBool(l, R) && toBool(r, R)
    case ENot(x) => !toBool(x, R)
    case EBound(v) => R(v).isNotNull
    case ECmp(op, l, r) =>
      val domain: Ty =
        if (infer(l) == TyNum || infer(r) == TyNum) TyNum
        else if (infer(l) == TyStr || infer(r) == TyStr) TyStr
        else TyTerm
      val (a, b): (Column, Column) = domain match {
        case TyNum => (num(l, R), num(r, R))
        case TyStr => (str(l, R), str(r, R))
        case _ => (termOf(l, R), termOf(r, R))
      }
      op match {
        case "=" => a === b
        case "!=" => a =!= b
        case "<" => cmpLess(domain, a, b)
        case "<=" => !cmpLess(domain, b, a)
        case ">" => cmpLess(domain, b, a)
        case ">=" => !cmpLess(domain, a, b)
      }
    case EIn(x, list, neg) =>
      val eqs = list.map(item => toBool(ECmp("=", x, item), R))
      val anyEq = eqs.reduceOption(_ || _).getOrElse(lit(false))
      if (neg) !anyEq else anyEq
    case EIf(c, t, f) => when(toBool(c, R), toBool(t, R)).otherwise(toBool(f, R))
    case ECoalesce(args) => coalesce(args.map(toBool(_, R)): _*)
    case ESameTerm(l, r) => termOf(l, R) === termOf(r, R)
    case EConst(t) if t.datatype == Term.XsdBoolean => lit(t.value == "true")
    case EVar(v) => value(R(v)) === "true" // effective boolean value of xsd:boolean var
    case EFunc("REGEX", args) =>
      val flags = if (args.size >= 3) constStr(args(2)) else ""
      val pat = (if (flags.contains("i")) "(?i)" else "") + constStr(args(1))
      str(args.head, R).rlike(pat)
    case EFunc("CONTAINS", Seq(a, b)) => str(a, R).contains(str(b, R))
    case EFunc("STRSTARTS", Seq(a, b)) => str(a, R).startsWith(str(b, R))
    case EFunc("STRENDS", Seq(a, b)) => str(a, R).endsWith(str(b, R))
    case EFunc("LANGMATCHES", Seq(a, b)) =>
      val pat = constStr(b)
      if (pat == "*") str(a, R) =!= "" else lower(str(a, R)) === pat.toLowerCase
    case EFunc("ISIRI", Seq(EVar(v))) => R(v).getField("kind") === Kind.Iri
    case EFunc("ISURI", Seq(EVar(v))) => R(v).getField("kind") === Kind.Iri
    case EFunc("ISBLANK", Seq(EVar(v))) => R(v).getField("kind") === Kind.BNode
    case EFunc("ISLITERAL", Seq(EVar(v))) => R(v).getField("kind") === Kind.Literal
    case EFunc("ISNUMERIC", Seq(EVar(v))) =>
      R(v).getField("datatype").isin(Term.XsdInteger, Term.XsdDecimal, Term.XsdDouble)
    case EExists(_, _) =>
      throw new SparqlParseException("EXISTS only supported as a top-level FILTER")
    case other => throw new SparqlParseException(s"not a boolean expression: $other")
  }

  /** term-domain inequality compares lexical values (subset semantics). */
  private def cmpLess(ty: Ty, a: Column, b: Column): Column = ty match {
    case TyTerm => a.getField("value") < b.getField("value")
    case _ => a < b
  }

  private def termOf(e: Expr, R: String => Column): Column = e match {
    case EVar(v) => R(v)
    case EConst(t) => struct(lit(t.kind).as("kind"), lit(t.value).as("value"),
      lit(t.lang).as("lang"), lit(t.datatype).as("datatype"))
    // term constructors (§17.4.2.5-8)
    case EFunc("IRI" | "URI", Seq(a)) =>
      struct(lit(Kind.Iri).as("kind"), str(a, R).as("value"),
        lit("").as("lang"), lit("").as("datatype"))
    case EFunc("STRLANG", Seq(a, l)) =>
      struct(lit(Kind.Literal).as("kind"), str(a, R).as("value"),
        str(l, R).as("lang"), lit("").as("datatype"))
    case EFunc("STRDT", Seq(a, dt)) =>
      struct(lit(Kind.Literal).as("kind"), str(a, R).as("value"),
        lit("").as("lang"), constTermValue(dt).as("datatype"))
    // nondeterministic constructors (§17.4.1.2, §17.4.2.3-4, §17.4.5.1)
    case EFunc("NOW", Seq()) =>
      struct(lit(Kind.Literal).as("kind"), lit(queryScope.nowLexical).as("value"),
        lit("").as("lang"), lit(Term.XsdDateTime).as("datatype"))
    case EFunc("UUID", Seq()) =>
      struct(lit(Kind.Iri).as("kind"),
        concat(lit("urn:uuid:"), expr("uuid()")).as("value"),
        lit("").as("lang"), lit("").as("datatype"))
    case EFunc("BNODE", Seq()) =>
      struct(lit(Kind.BNode).as("kind"),
        concat(lit("b"), regexp_replace(expr("uuid()"), "-", "")).as("value"),
        lit("").as("lang"), lit("").as("datatype"))
    case EFunc("BNODE", Seq(a)) => // same label for equal args WITHIN a query
      struct(lit(Kind.BNode).as("kind"),
        concat(lit("b"), md5(concat(lit(queryScope.bnodeSalt), str(a, R)))).as("value"),
        lit("").as("lang"), lit("").as("datatype"))
    case other => throw new SparqlParseException(s"not a term: $other")
  }

  private def constTermValue(e: Expr): Column = e match {
    case EConst(t) => lit(t.value)
    case other => throw new SparqlParseException(s"constant IRI required: $other")
  }

  /** BIND target: plain typed column for computed values, struct for terms. */
  def toTerm(e: Expr, R: String => Column): Column = infer(e) match {
    case TyNum => num(e, R)
    case TyStr => str(e, R)
    case TyBool => toBool(e, R)
    case TyTerm => termOf(e, R)
  }
}

/** SPARQL 1.1 aggregates (reference `api.rs:2042-2050`). SUM/AVG go through
  * exact decimal so results are partition-order independent; SAMPLE is
  * defined as MIN for determinism; GROUP_CONCAT sorts its inputs.
  */
object AggCompiler {
  import ExprCompiler._

  def compile(a: AggExpr, R: String => Column): Column = {
    val c: Column = a.fn match {
      case "COUNT" =>
        a.arg match {
          case None => count(lit(1))
          case Some(EVar(v)) if a.distinct => countDistinct(R(v))
          case Some(EVar(v)) => count(R(v))
          case Some(e) if a.distinct => countDistinct(str(e, R))
          case Some(e) => count(str(e, R))
        }
      case "SUM" =>
        sum(num(a.arg.get, R).cast(DecimalType(18, 4))).cast(DoubleType)
      case "AVG" =>
        sum(num(a.arg.get, R).cast(DecimalType(18, 4))).cast(DoubleType) /
          count(num(a.arg.get, R))
      case "MIN" => min(argCol(a, R))
      case "MAX" => max(argCol(a, R))
      case "SAMPLE" => min(strArg(a, R))
      case "GROUP_CONCAT" =>
        val in = if (a.distinct) collect_set(strArg(a, R)) else collect_list(strArg(a, R))
        array_join(array_sort(in), a.separator)
      case other => throw new SparqlParseException(s"unsupported aggregate $other")
    }
    c.as(a.as)
  }

  /** MIN/MAX: numeric when the argument is a numeric expression, else the
    * lexical value (wrap with STR(...) to force string aggregation). */
  private def argCol(a: AggExpr, R: String => Column): Column = a.arg.get match {
    case e if infer(e) == TyNum => num(e, R)
    case e if infer(e) == TyStr => str(e, R)
    case EVar(v) => value(R(v)) // lexical; wrap in arithmetic to force numeric
    case e => str(e, R)
  }

  private def strArg(a: AggExpr, R: String => Column): Column = a.arg.get match {
    case e if infer(e) == TyNum => num(e, R).cast(StringType)
    case EVar(v) => value(R(v))
    case e => str(e, R)
  }
}
