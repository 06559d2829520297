SELECT COUNT(*) FROM site as s, so_user as u, question as q, tag_question as tq, tag as t, answer as a
WHERE u.site_id = s.site_id AND q.owner_user_id = u.id AND q.site_id = s.site_id
  AND tq.question_id = q.id AND tq.site_id = s.site_id AND t.id = tq.tag_id
  AND a.question_id = q.id AND a.site_id = s.site_id
  AND s.site_name = 'stackoverflow' AND t.name = 'javascript'
  AND u.reputation >= 100 AND a.score >= 0;
