SELECT COUNT(*) FROM posts as p, tags as t WHERE t.ExcerptPostId = p.Id AND p.CommentCount=4 AND t.Count>=80;
