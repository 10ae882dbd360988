package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec.{ColumnType, MappingSpec, Operation}

class MappingSpecSuite extends AnyFunSuite {

  private val json = """
    [{"source_object": "Account",
      "destination_object": "Accounts__c",
      "where_condition": "WHERE Name = 'x'",
      "mapping": [
        {"table_src": "Account", "column_src": "Id",
         "table_dst": "Accounts__c", "column_dst": "Old_Record_Id__c",
         "operation": "copy", "column_type": "src_id"},
        {"table_src": "Account", "column_src": "Name",
         "table_dst": "Accounts__c", "column_dst": "Name",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "Owner", "column_src": "Email",
         "table_dst": "Accounts__c", "column_dst": "Owner_Email__c",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "Account", "column_src": "New_Id__c",
         "table_dst": "Accounts__c", "column_dst": "Id",
         "operation": "upd_src", "column_type": "dst_id"}]}]"""

  test("parses the reference's array-of-specs JSON shape") {
    val specs = MappingSpec.fromJson(json)
    assert(specs.size == 1)
    val s = specs.head
    assert(s.sourceObject == "Account")
    assert(s.destinationObject == "Accounts__c")
    assert(s.mapping.size == 4)
    assert(s.mapping.head.columnType == ColumnType.SrcId)
  }

  test("whereExpr strips a leading WHERE keyword") {
    assert(MappingSpec.fromJson(json).head.whereExpr.contains("Name = 'x'"))
  }

  test("blank where_condition maps to None") {
    val s = MappingSpec.fromJson(json).head.copy(whereCondition = "  ")
    assert(s.whereExpr.isEmpty)
  }

  test("dstUpdateRelations covers all elements, dst -> src") {
    val m = MappingSpec.fromJson(json).head.dstUpdateRelations
    assert(m("Old_Record_Id__c") == "Id")
    assert(m("Owner_Email__c") == "Email")
    assert(m.size == 4)
  }

  test("srcUpdateRelations keeps upd_src and src_id elements only") {
    val m = MappingSpec.fromJson(json).head.srcUpdateRelations
    assert(m == Map("New_Id__c" -> "Id", "Id" -> "Old_Record_Id__c"))
  }

  test("srcOldIdColumn finds the upd_src source column") {
    val s = MappingSpec.fromJson(json).head
    assert(s.srcOldIdColumn.contains("New_Id__c"))
    assert(s.dstSrcIdColumn.contains("Old_Record_Id__c"))
  }

  test("dstIdColumns lists non-regular destination columns") {
    assert(MappingSpec.fromJson(json).head.dstIdColumns ==
      Seq("Old_Record_Id__c", "Id"))
  }

  test("empty mapping is rejected") {
    assertThrows[IllegalArgumentException] {
      MappingSpec("a", "b", "", Nil)
    }
  }

  test("constants default to empty and parse when present") {
    assert(MappingSpec.fromJson(json).head.constants.isEmpty)
    val withConst = json.replace("\"mapping\":",
      "\"constants\": {\"Company_Name__c\": \"X\"}, \"mapping\":")
    assert(MappingSpec.fromJson(withConst).head.constants ==
      Map("Company_Name__c" -> "X"))
  }

  test("operation/columnType enums match the reference vocabulary") {
    assert(Operation.UpdSrc == "upd_src")
    assert(ColumnType.Regular == "regular")
    assert(ColumnType.SrcId == "src_id")
    assert(ColumnType.DstId == "dst_id")
  }
}
