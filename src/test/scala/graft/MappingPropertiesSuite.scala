package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.spec.{ColumnType, MappingElement, MappingSpec, Operation}

/** Property-based coverage of the mapping layer (SURVEY.md §5 item 2):
  * random specs through the JSON codec and the relation accessors.
  * Raw ScalaCheck generators driven with deterministic seeds (the
  * scalatest-scalacheck bridge is not in the offline dependency set). */
class MappingPropertiesSuite extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val ident: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(7, Gen.alphaNumChar)
    } yield (h :: t).mkString

  private val element: Gen[MappingElement] =
    for {
      cs <- ident; cd <- ident
      op <- Gen.oneOf("copy", Operation.UpdSrc)
      ct <- Gen.oneOf(ColumnType.Regular, ColumnType.SrcId, ColumnType.DstId)
    } yield MappingElement("src_obj", cs, "dst_obj", cd, op, ct)

  private val spec: Gen[MappingSpec] =
    for {
      n <- Gen.choose(1, 12)
      es <- Gen.listOfN(n, element)
      where <- Gen.oneOf("", "a > 1", "WHERE a > 1")
    } yield MappingSpec("src_obj", "dst_obj", where, es)

  private def toJson(s: MappingSpec): String = {
    def e(m: MappingElement) =
      s"""{"table_src":"${m.tableSrc}","column_src":"${m.columnSrc}",
          "table_dst":"${m.tableDst}","column_dst":"${m.columnDst}",
          "operation":"${m.operation}","column_type":"${m.columnType}"}"""
    s"""[{"source_object":"${s.sourceObject}",
         "destination_object":"${s.destinationObject}",
         "where_condition":"${s.whereCondition}",
         "mapping":[${s.mapping.map(e).mkString(",")}]}]"""
  }

  test("JSON round trip preserves the spec") {
    forAll(spec) { s =>
      val back = MappingSpec.fromJson(toJson(s)).head
      assert(back == s)
    }
  }

  test("dstUpdateRelations covers every dst column, mapping to a src column of the spec") {
    forAll(spec) { s =>
      val m = s.dstUpdateRelations
      assert(m.keySet == s.mapping.map(_.columnDst).toSet)
      assert(m.values.toSet.subsetOf(s.mapping.map(_.columnSrc).toSet))
      // last-wins: each dst column maps to the LAST element bearing it
      s.mapping.groupBy(_.columnDst).foreach { case (d, es) =>
        assert(m(d) == es.last.columnSrc)
      }
    }
  }

  test("srcUpdateRelations only contains upd_src/src_id columns, upd_src winning") {
    forAll(spec) { s =>
      val m = s.srcUpdateRelations
      val eligible = s.mapping.filter(e =>
        e.operation == Operation.UpdSrc || e.columnType == ColumnType.SrcId)
      assert(m.keySet.subsetOf(eligible.map(_.columnSrc).toSet))
      // any column with an upd_src element resolves to an upd_src mapping
      s.mapping.filter(_.operation == Operation.UpdSrc)
        .groupBy(_.columnSrc).foreach { case (c, es) =>
          assert(m(c) == es.last.columnDst)
        }
    }
  }

  test("whereExpr strips WHERE and blanks to None") {
    forAll(spec) { s =>
      s.whereCondition match {
        case "" => assert(s.whereExpr.isEmpty)
        case w => assert(s.whereExpr.contains("a > 1"), w)
      }
    }
  }

  test("srcColumns preserves mapping order and multiplicity") {
    forAll(spec) { s =>
      assert(s.srcColumns == s.mapping.map(_.columnSrc))
    }
  }

  test("srcOldIdColumn agrees with the first upd_src element") {
    forAll(spec) { s =>
      assert(s.srcOldIdColumn ==
        s.mapping.find(_.operation == Operation.UpdSrc).map(_.columnSrc))
    }
  }
}
