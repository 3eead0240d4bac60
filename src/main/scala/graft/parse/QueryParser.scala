package graft.parse

import graft.model.{Cube, CubeQueryException}
import graft.query.{CubeQuery, Pred}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Query-tree front end — the parse_tree.rb analogue (reference
  * lib/activecube/graphql/parse_tree.rb:14-107). Input is a JSON document
  * mirroring a GraphQL selection set (the GraphQL wire layer itself is
  * out of scope per BASELINE.json):
  *
  * {{{
  * { "cube": "lineitem",
  *   "args": { "shipDate": {"between": ["1996-01-01","1996-12-31"]},
  *             "any": [ {"returnFlag": {"eq": "R"}}, ... ],
  *             "options": {"desc": "cnt", "limitBy": {...}, "limit": 5} },
  *   "fields": [
  *     {"name": "returnFlag", "alias": "flag"},
  *     {"name": "shipDate", "fields": [{"name": "year"}]},
  *     {"name": "count", "alias": "cnt"},
  *     {"name": "amount", "args": {"quantity": {"gt": 25}}} ] }
  * }}}
  *
  * Faithful semantics:
  *   - key = dotted path of alias-or-name, '_aq.' prefix
  *     (parse_tree.rb:8,21); aliases make distinct columns (R4)
  *   - JSON object order IS document order, so options apply in user
  *     order (O16, parse_tree.rb:46-68)
  *   - metric args become metric-level FILTER predicates (O5)
  *   - selector op hashes, `any:` OR-trees, nil-pruning (O6-O10)
  *   - `_aq.` injection guard on argument values (V5,
  *     parse_tree.rb:113-114)
  *   - duplicate selection names collapse (parse_tree.rb:38); __typename
  *     skipped except under unions, where it is required (R8)
  */
object QueryParser {

  val KeyPrefix = "_aq." // parse_tree.rb:8
  private val TypeName = "__typename" // parse_tree.rb:7

  /** Per-row union type resolution (response_builder.rb:21-24 resolves
    * `__typename` from the runtime row, not statically): `on` names a
    * result column (flat name) whose value selects the typename via
    * `mapping`, falling back to `default`. */
  final case class Discriminator(
      on: String,
      mapping: Seq[(String, String)],
      default: String)

  /** Element tree node (parse_tree.rb:11-12). `key` is the dotted result
    * path; `flatName` the DataFrame-safe ("__"-joined) column name.
    * `onType` restricts the element to rows of one union member
    * (heterogeneous response shapes: other rows get NULL). */
  final case class Element(
      name: String,
      alias: Option[String],
      typeName: Option[String],
      union: Boolean,
      kind: Kind,
      path: Seq[String],
      children: Seq[Element],
      discriminator: Option[Discriminator] = None,
      onType: Option[String] = None) {
    def outName: String = alias.getOrElse(name)
    def key: String = KeyPrefix + path.mkString(".")
    def flatName: String = path.mkString("__")
    def isLeaf: Boolean = children.isEmpty
  }

  sealed trait Kind
  case object MetricKind extends Kind
  case object DimensionKind extends Kind
  case object DimFieldKind extends Kind
  case object RootKind extends Kind

  final case class Parsed(query: CubeQuery, root: Element)

  def parse(cube: Cube, json: String): Parsed = {
    val doc = JsonMethods.parse(json)
    val fields = doc \ "fields" match {
      case JArray(fs) => fs
      case _ => throw new CubeQueryException("query document needs a 'fields' array")
    }
    val rootArgs = doc \ "args" match {
      case JObject(kv) => kv
      case JNothing => Nil
      case other => throw new CubeQueryException(s"'args' must be an object, got $other")
    }

    // ---- element tree (DFS, parse_tree.rb:14-44) --------------------
    def buildChildren(parent: Option[Element], parentUnion: Boolean,
        nodes: Seq[JValue], basePath: Seq[String]): Seq[Element] = {
      val built = nodes.map(n => buildElement(parent, n, basePath))
      // skip __typename unless under a union (parse_tree.rb:39); raise if
      // a union lacks it (response_builder.rb:21-24)
      val (tn, rest) = built.partition(_.name == TypeName)
      if (parentUnion && tn.isEmpty)
        throw new CubeQueryException(s"union element requires $TypeName") // R8
      val kept = if (parentUnion) built else rest
      // dedup by output name (parse_tree.rb:38 uniq(&:name))
      kept.groupBy(_.outName).values.map(_.head).toSeq
        .sortBy(e => kept.indexWhere(_.outName == e.outName))
    }

    def buildElement(parent: Option[Element], node: JValue, basePath: Seq[String]): Element = {
      val name = node \ "name" match {
        case JString(s) => s
        case _ => throw new CubeQueryException("field needs a 'name'")
      }
      val alias = node \ "alias" match { case JString(s) => Some(s); case _ => None }
      val typeName = node \ "type" match { case JString(s) => Some(s); case _ => None }
      val union = node \ "union" match { case JBool(b) => b; case _ => false }
      val onType = node \ "onType" match { case JString(s) => Some(s); case _ => None }
      val out = alias.getOrElse(name)
      val path = basePath :+ out

      // classify (parse_tree.rb:25-36)
      val kind: Kind = parent.map(_.kind) match {
        case None | Some(RootKind) =>
          if (name == TypeName) DimFieldKind
          else if (cube.metrics.contains(name)) MetricKind
          else if (cube.dimensions.contains(name)) DimensionKind
          else throw new CubeQueryException(
            s"cube '${cube.name}': '$name' is neither metric nor dimension") // V1
        case Some(DimensionKind) | Some(DimFieldKind) => DimFieldKind
        case Some(MetricKind) =>
          throw new CubeQueryException(s"metric '$name' cannot have sub-fields")
      }

      val self = Element(name, alias, typeName, union, kind, path, Nil,
        parseDiscriminator(node \ "discriminator"), onType)
      val kids = node \ "fields" match {
        case JArray(fs) => buildChildren(Some(self), union, fs, path)
        case _ => Nil
      }
      self.copy(children = kids)
    }

    // the whole cube field may itself be the union (the common GraphQL
    // shape: each result row is one of several member types)
    val rootUnion = doc \ "union" match { case JBool(b) => b; case _ => false }
    val rootSelf = Element("root", None, None, rootUnion, RootKind, Nil, Nil,
      parseDiscriminator(doc \ "discriminator"))
    val roots = buildChildren(Some(rootSelf), parentUnion = rootUnion, fields, Nil)
    val root = rootSelf.copy(children = roots)

    // ---- fold element tree into the query builder -------------------
    // (parse_tree.rb:84-107 append_query: pre-order, immutable rebinds)
    var q = CubeQuery(cube)

    /** Split a metric element's args the way apply_args does
      * (parse_tree.rb:111-135): selector names (and `any`) become a
      * FILTER predicate; every other name is dispatched onto the metric
      * (e.g. topK's size — validated against the metric at compile). */
    def metricArgs(node: JValue): (Option[Pred], Seq[(String, Any)]) =
      node \ "args" match {
        case JObject(kv) if kv.nonEmpty =>
          val (selArgs, metArgs) = kv.partition { case (k, _) =>
            k == "any" || cube.selectors.contains(k)
          }
          (if (selArgs.nonEmpty) Some(parseArgsAsPred(selArgs)) else None,
            metArgs.map { case (k, v) => k -> optionValue(k, v) })
        case _ => (None, Nil)
      }

    def fieldNode(e: Element, nodes: Seq[JValue]): JValue =
      nodes.find { n =>
        val nm = n \ "name" match { case JString(s) => s; case _ => "" }
        val al = n \ "alias" match { case JString(s) => Some(s); case _ => None }
        al.getOrElse(nm) == e.outName
      }.getOrElse(JNothing)

    def fold(e: Element, node: JValue): Unit = e.kind match {
      case MetricKind =>
        metricArgs(node) match {
          case (None, Nil) => q = q.measure(e.flatName, e.name)
          case (Some(p), Nil) => q = q.measureWhen(e.flatName, e.name, p)
          case (p, args) => q = q.measureArgs(e.flatName, e.name, args, p)
        }
      case DimensionKind if e.isLeaf =>
        q = q.slice(e.flatName, e.name)
      case DimensionKind =>
        // dimension args apply at query level (parse_tree.rb:92-93)
        node \ "args" match {
          case JObject(kv) if kv.nonEmpty => q = q.when(parseArgsAsPred(kv))
          case _ => ()
        }
        val kids = node \ "fields" match { case JArray(fs) => fs; case _ => Nil }
        e.children.foreach(c => foldDimField(c, e.name, Nil, kids))
      case _ => ()
    }

    def foldDimField(e: Element, dim: String, sub: Seq[String], nodes: Seq[JValue]): Unit = {
      if (e.name == TypeName) {
        () // metadata-only: doesn't reach the plan (SURVEY §4 __typename
           // elision); Renest emits it as a literal discriminator (R8)
      } else if (e.isLeaf) {
        q = q.slice(e.flatName, dim, (sub :+ e.name): _*)
      } else {
        val n = fieldNode(e, nodes)
        val kids = n \ "fields" match { case JArray(fs) => fs; case _ => Nil }
        e.children.foreach(c => foldDimField(c, dim, sub :+ e.name, kids))
      }
    }

    roots.foreach(e => fold(e, fieldNode(e, fields)))

    // ---- root args: predicates + ordered options (O16) --------------
    rootArgs.foreach {
      case ("options", JObject(opts)) =>
        opts.foreach { case (k, v) => q = q.option(k, optionValue(k, v)) }
      case ("any", arr) => q = q.when(parseAny(arr)) // O10
      case (sel, JObject(ops)) if cube.selectors.contains(sel) =>
        q = q.when(parseOpHash(sel, ops))
      case (sel, v) if cube.selectors.contains(sel) =>
        q = q.when(Pred.Op(sel, "eq", jvalueToOption(v))) // bare value = eq
      case (k, _) =>
        throw new CubeQueryException(s"unknown argument '$k'") // V4
    }

    Parsed(q, root)
  }

  // ------------------------------------------------------------------

  /** AND across the entries of an args object (parse_tree.rb:186-190). */
  private def parseArgsAsPred(kv: Seq[(String, JValue)]): Pred =
    Pred.And(kv.map {
      case ("any", arr) => parseAny(arr)
      case (sel, JObject(ops)) => parseOpHash(sel, ops)
      case (sel, v) => Pred.Op(sel, "eq", jvalueToOption(v))
    })

  /** `any:` = OR across array elements, AND within each
    * (parse_tree.rb:117-118,162-183). */
  private def parseAny(v: JValue): Pred = v match {
    case JArray(items) =>
      Pred.Or(items.map {
        case JObject(kv) => parseArgsAsPred(kv)
        case other => throw new CubeQueryException(s"'any' items must be objects, got $other") // V7
      })
    case other => throw new CubeQueryException(s"'any' must be an array, got $other")
  }

  /** One selector's operator hash: {gt: 10, lteq: 40} — each entry one
    * predicate, dynamic-dispatch analogue of parse_tree.rb:149-156.
    * snake_case accepted (camelization, parse_tree.rb:170). */
  private def parseOpHash(sel: String, ops: Seq[(String, JValue)]): Pred =
    Pred.And(ops.map { case (op, arg) =>
      Pred.Op(sel, camelize(op), jvalueToOption(arg))
    })

  /** `{"on": "etype", "mapping": {"purchase": "PurchaseStats", ...},
    * "default": "EventStats"}` — the per-row typename rule (R8). */
  private def parseDiscriminator(v: JValue): Option[Discriminator] = v match {
    case JObject(kv) =>
      val m = kv.toMap
      val on = m.get("on") match {
        case Some(JString(s)) => s
        case _ => throw new CubeQueryException("discriminator needs an 'on' column")
      }
      val mapping = m.get("mapping") match {
        case Some(JObject(pairs)) => pairs.map {
          case (k, JString(t)) => k -> t
          case (k, other) => throw new CubeQueryException(
            s"discriminator mapping '$k' must be a type name, got $other")
        }
        case _ => Nil
      }
      val default = m.get("default") match {
        case Some(JString(s)) => s
        case _ => ""
      }
      Some(Discriminator(on, mapping, default))
    case JNothing | JNull => None
    case other => throw new CubeQueryException(s"bad discriminator: $other")
  }

  private def camelize(s: String): String = {
    val parts = s.split("_")
    parts.head + parts.tail.map(_.capitalize).mkString
  }

  /** Option/metric-arg value conversion. Integers keep their value: Int
    * when they fit, Long otherwise (the consumer errors cleanly on an
    * out-of-range Long — no silent 2³¹ wraparound). The `_aq.` injection
    * guard applies here too: the reference raises for ANY argument value
    * containing the key prefix (parse_tree.rb:113-114), not just
    * selector args. */
  private def optionValue(name: String, v: JValue): Any = v match {
    case JObject(kv) => kv.map { case (k, vv) => k -> optionValue(k, vv) }.toMap
    case JArray(items) => items.map(i => optionValue(name, i))
    case JInt(i) =>
      if (i.isValidInt) i.toInt
      else if (i.isValidLong) i.toLong
      else throw new CubeQueryException(s"option '$name' value out of range: $i")
    case JLong(l) =>
      if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt else l
    case JDouble(d) => d // fractional metric args (thresholds, quantile levels)
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JString(s) =>
      if (s.contains(KeyPrefix))
        throw new CubeQueryException(s"argument value may not contain '$KeyPrefix'") // V5
      s
    case other => throw new CubeQueryException(s"bad option value for '$name': $other")
  }

  /** Argument value conversion incl. the `_aq.` injection guard (V5,
    * parse_tree.rb:113-114) and None for JSON null (nil semantics). */
  private def jvalueToOption(v: JValue): Option[Any] = v match {
    case JNull | JNothing => None
    case JString(s) =>
      if (s.contains(KeyPrefix))
        throw new CubeQueryException(s"argument value may not contain '$KeyPrefix'") // V5
      Some(s)
    case JInt(i) => Some(i.toLong)
    case JLong(l) => Some(l)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JBool(b) => Some(b)
    case JArray(items) => Some(items.map(i => jvalueToOption(i).orNull))
    case other => throw new CubeQueryException(s"unsupported argument value: $other")
  }
}
