SELECT COUNT(*) FROM site as s, question as q, post_link as pl, tag_question as tq, tag as t
WHERE q.site_id = s.site_id AND pl.post_id_to = q.id AND pl.site_id = s.site_id
  AND tq.question_id = q.id AND tq.site_id = s.site_id AND t.id = tq.tag_id
  AND s.site_name = 'stackoverflow' AND t.name IN ('git','linux') AND pl.link_type_id = 1;
